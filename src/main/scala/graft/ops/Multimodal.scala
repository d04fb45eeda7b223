package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.11): image/audio/video as
  * opaque `binary` columns with typed metadata alongside.
  *
  * The Spark-side machinery here is real — binary columns, typed
  * `Dataset[T]` with case-class encoders, `mapPartitions` batch-shaped
  * decode, frame sampling via array ops. Image decode is real too:
  * [[ImageIoDecode]] reads true dimensions/format from PNG/JPEG/GIF/BMP
  * headers via the JDK's `javax.imageio` (no external libraries).
  * Audio/video decode stays behind the same seam as a clearly-marked
  * deterministic fake ([[FakeDecode]] — no codec libraries in this
  * container); swapping in a JNI/javacv call changes nothing else. The
  * registered oracle queries use FakeDecode so DuckDB can replay the
  * metadata byte-exactly; ImageIoDecode is gated by the same contract
  * spec plus real generated-image tests.
  *
  * Scale notes: binary payloads dominate row size → keep them out of
  * shuffles (derive metadata early, project blobs away before wide ops);
  * `mapPartitions` amortizes decoder init per partition, the same shape a
  * Python `mapInPandas` batch UDF has.
  */
object Multimodal {

  final case class MediaRecord(doc_id: Long, media: Array[Byte])
  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      head_code: Int,
      fake_width: Int,
      fake_height: Int,
      format_tag: String
  )

  /** The decoder CONTRACT any real media backend must satisfy (the
    * swap-in point for a javacv/ffmpeg implementation). Requirements,
    * enforced by MediaDecoderContractSpec against every implementation:
    *  - total: never throws, for empty and single-byte payloads included;
    *  - deterministic: equal bytes → equal metadata (no wall clock, no
    *    RNG), so results are reproducible across executors and retries;
    *  - positive dimensions whenever the payload is non-empty, 0 only for
    *    empty payloads;
    *  - non-empty format tag.
    * Implementations must be Serializable: the decoder ships to executors
    * inside the mapPartitions closure.
    */
  trait MediaDecoder extends Serializable {
    /** (width, height, formatTag) for a payload. */
    def decode(bytes: Array[Byte]): (Int, Int, String)
  }

  /** STUB — deterministic fake decode standing in for a real image/audio
    * decoder (none available in this environment). Metadata is a pure
    * function of the payload bytes so tests and oracles are reproducible.
    * Swapping in a real `MediaDecoder` changes nothing else in the
    * pipeline; it must pass the same contract spec.
    */
  object FakeDecode extends MediaDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, String) = {
      val w = if (bytes.nonEmpty) ((bytes(0) & 0xff) % 64) + 1 else 0
      val h = if (bytes.length > 1) ((bytes(1) & 0xff) % 64) + 1 else 0
      val tag = if (bytes.length % 2 == 0) "imgA" else "imgB"
      (w, h, tag)
    }
  }

  /** REAL image decoder over the JDK's built-in `javax.imageio` — no
    * external libraries. Decodable payloads (PNG/JPEG/GIF/BMP — whatever
    * the JVM's registered ImageReaders handle) return their true pixel
    * dimensions and format name; undecodable bytes fall back to the same
    * deterministic byte-derived pseudo-metadata as [[FakeDecode]] with an
    * `undecodable` tag, keeping the decoder total and
    * contract-compliant (positive dims for non-empty payloads).
    * Audio/video remain env-blocked (no codec libraries in the JVM) —
    * they stay behind the same seam.
    */
  object ImageIoDecode extends MediaDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, String) = {
      if (bytes.isEmpty) return (0, 0, "empty")
      try {
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (readers.hasNext) {
            val r = readers.next()
            try {
              r.setInput(in)
              // header-only read: width/height/format come from the
              // image header without decoding pixel data — this is the
              // metadata-extraction fast path a 100 TB scan wants
              (r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase)
            } finally r.dispose()
          } else fallback(bytes)
        } finally if (in != null) in.close()
      } catch { case _: Exception => fallback(bytes) }
    }

    private def fallback(bytes: Array[Byte]): (Int, Int, String) = {
      val (w, h, _) = FakeDecode.decode(bytes)
      (w, h, "undecodable")
    }
  }

  /** REAL audio decoder over the JDK's built-in `javax.sound.sampled` —
    * no external libraries. Decodable payloads (WAV/AIFF/AU — the JVM's
    * registered AudioFileReaders) return (frameLength, channels,
    * formatType) from the file header alone; undecodable bytes fall back
    * like [[ImageIoDecode]]. Width carries the frame count and height the
    * channel count — the two integers a sampling/segmentation pipeline
    * partitions on. Video alone stays env-blocked (no container/codec
    * parsers in the JDK).
    */
  object AudioDecode extends MediaDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, String) = {
      if (bytes.isEmpty) return (0, 0, "empty")
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(bytes))
        val frames = aff.getFrameLength
        val channels = aff.getFormat.getChannels
        (if (frames > 0) frames else 1,
          if (channels > 0) channels else 1,
          aff.getType.toString.toLowerCase)
      } catch {
        case _: Exception =>
          val (w, h, _) = FakeDecode.decode(bytes)
          (w, h, "undecodable")
      }
    }
  }

  /** Deterministic real PNG payload of exactly w×h pixels, written with
    * the JDK's ImageIO encoder. Pixels are a pure function of position, so
    * equal (w, h) → equal bytes on every executor — the synthetic fixture
    * that lets the REAL header decode path run inside the oracle gate
    * (expected dims are known arithmetic, see `mm_decode_real`).
    */
  def synthPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic real WAV payload with exactly `frames` frames of
    * `channels`-channel 16-bit PCM silence (JDK `javax.sound.sampled`
    * writer) — the audio counterpart of [[synthPng]].
    */
  def synthWav(frames: Int, channels: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(8000f, 16, channels, true, false)
    val data = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Attach a binary media column. On the fixtures the document text bytes
    * stand in for an image payload; in production this is the raw blob
    * column of the table.
    */
  def withBinary(df: DataFrame, textCol: String, binCol: String = "media"): DataFrame =
    df.withColumn(binCol, encode(col(textCol), "UTF-8"))

  /** Batch decode: partition-at-a-time over a typed Dataset — decoder init
    * happens once per partition (the mapInPandas batch shape). The decoder
    * is injected; FakeDecode is the environment-forced default.
    */
  def extractMeta(
      spark: SparkSession,
      records: Dataset[MediaRecord],
      decoder: MediaDecoder = FakeDecode
  ): Dataset[MediaMeta] = {
    import spark.implicits._
    records.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { r =>
        val (w, h, tag) = decoder.decode(r.media)
        MediaMeta(
          doc_id = r.doc_id,
          n_bytes = r.media.length.toLong,
          head_code = if (r.media.nonEmpty) r.media(0) & 0xff else -1,
          fake_width = w,
          fake_height = h,
          format_tag = tag
        )
      }
    }
  }

  /** Metadata via pure Catalyst expressions where possible (stays inside
    * whole-stage codegen; preferred over mapPartitions for anything
    * expressible). head_code = first byte as unsigned int.
    */
  def metaColumns(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(
      col(idCol),
      length(col(binCol)).as("n_bytes"),
      // true first BYTE as unsigned int (hex of the 1-byte slice) —
      // casting binary to string and taking ascii() would decode UTF-8
      // and disagree with FakeDecode's bytes(0) & 0xff on non-ASCII
      when(
        length(col(binCol)) > 0,
        conv(hex(substring(col(binCol), 1, 1)), 16, 10).cast("int")
      ).otherwise(-1).as("head_code")
    )

  /** Frame sampling: every `stride`-th byte as a "frame" (index + payload
    * sample) — the explode/posexplode plumbing a real video frame-sampler
    * uses, with the frame decode stubbed to a byte read.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String, stride: Int): DataFrame = {
    // floor division: Spark's `/` on ints yields double
    val nFrames = floor((length(col(binCol)) + stride - 1) / lit(stride)).cast("int")
    df.select(
      col(idCol),
      when(nFrames > 0, sequence(lit(0), nFrames - 1)).otherwise(array().cast("array<int>")).as("fidx")
    )
      .select(col(idCol), explode(col("fidx")).as("frame_idx"))
      .withColumn("frame_offset", col("frame_idx") * stride)
  }
}
