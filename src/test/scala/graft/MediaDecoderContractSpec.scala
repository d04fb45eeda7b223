package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The contract every MediaDecoder implementation must satisfy (see the
  * trait's scaladoc). A real javacv/ffmpeg backend plugs in by adding its
  * instance to `implementations` — the same assertions then gate it.
  */
class MediaDecoderContractSpec extends AnyFunSuite {

  private val implementations: Seq[(String, Multimodal.MediaDecoder)] =
    Seq(
      "FakeDecode" -> Multimodal.FakeDecode,
      "ImageIoDecode" -> Multimodal.ImageIoDecode,
      "AudioDecode" -> Multimodal.AudioDecode,
      "VideoDecode" -> Multimodal.VideoDecode)

  /** An in-memory image encoded via the JDK's own writers — real bytes in
    * the named format, no fixtures or external tools needed.
    */
  private def imageBytes(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos), s"JDK cannot encode $format")
    bos.toByteArray
  }

  test("ImageIoDecode: true header dimensions and format for real PNG/JPEG/BMP/GIF bytes") {
    Seq("png", "jpeg", "bmp", "gif").foreach { fmt =>
      val (w, h, tag) = Multimodal.ImageIoDecode.decode(imageBytes(37, 21, fmt))
      assert((w, h) == (37, 21), s"$fmt decoded as ${w}x$h")
      assert(tag == fmt, s"$fmt tagged $tag")
    }
  }

  /** A real PCM WAV file encoded by the JDK's own writer. */
  private def wavBytes(frames: Int, channels: Int, sampleRate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    (0 until pcm.length).foreach(i => pcm(i) = ((i * 7) & 0x7f).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("AudioDecode: true frame/channel counts and type for real WAV bytes") {
    val (frames, channels, tag) = Multimodal.AudioDecode.decode(wavBytes(480, 2, 16000f))
    assert(frames == 480, s"frames $frames")
    assert(channels == 2, s"channels $channels")
    assert(tag == "wave", s"tag $tag")
    val mono = Multimodal.AudioDecode.decode(wavBytes(100, 1, 8000f))
    assert(mono == ((100, 1, "wave")), mono)
  }

  test("AudioDecode: non-audio bytes fall back deterministically with an undecodable tag") {
    val junk = "definitely not audio".getBytes("UTF-8")
    val (w, h, tag) = Multimodal.AudioDecode.decode(junk)
    assert(tag == "undecodable")
    assert(w > 0 && h > 0)
    assert(Multimodal.AudioDecode.decode(junk.clone()) == ((w, h, tag)))
  }

  test("ImageIoDecode: non-image bytes fall back deterministically with an undecodable tag") {
    val junk = "not an image at all".getBytes("UTF-8")
    val (w, h, tag) = Multimodal.ImageIoDecode.decode(junk)
    assert(tag == "undecodable")
    assert(w > 0 && h > 0)
    assert(Multimodal.ImageIoDecode.decode(junk.clone()) == ((w, h, tag)))
  }

  test("VideoDecode: container header dims/frames/handler for a real MJPEG AVI") {
    val avi = Multimodal.synthAvi(48, 32, 5)
    assert(Multimodal.VideoDecode.decode(avi) == ((48, 32, "avi-mjpg")))
    assert(Multimodal.VideoDecode.aviMeta(avi).contains((48, 32, 5, "mjpg")))
  }

  test("videoFrames: every movi chunk is a real JPEG with the container's dimensions") {
    val avi = Multimodal.synthAvi(21, 17, 4)
    val frames = Multimodal.videoFrames(avi)
    assert(frames.length == 4)
    frames.foreach { fb =>
      val (w, h, tag) = Multimodal.ImageIoDecode.decode(fb)
      assert((w, h, tag) == ((21, 17, "jpeg")))
    }
    // frames differ (per-frame pixel function), but equal inputs rebuild
    // byte-identical containers — executor-side determinism
    assert(frames.distinct.length == 4)
    assert(java.util.Arrays.equals(avi, Multimodal.synthAvi(21, 17, 4)))
  }

  test("videoFrames: odd-length JPEG payloads keep chunk alignment (RIFF even padding)") {
    // exercise several shapes so at least one frame payload is odd-length
    (1 to 6).foreach { n =>
      val avi = Multimodal.synthAvi(n * 3 + 1, n * 2 + 1, n)
      assert(Multimodal.videoFrames(avi).length == n, s"n=$n")
    }
  }

  test("VideoDecode: non-AVI bytes (including a bare JPEG) fall back with an undecodable tag") {
    Seq(
      "not a riff container".getBytes("UTF-8"),
      imageBytes(8, 8, "jpeg"), // a real media payload, wrong container
      wavBytes(10, 1, 8000f)    // RIFF but WAVE, not AVI
    ).foreach { junk =>
      val (w, h, tag) = Multimodal.VideoDecode.decode(junk)
      assert(tag == "undecodable")
      assert(w > 0 && h > 0)
      assert(Multimodal.VideoDecode.decode(junk.clone()) == ((w, h, tag)))
    }
  }

  private val payloads: Seq[Array[Byte]] = Seq(
    Array.emptyByteArray,
    Array[Byte](0),
    Array[Byte](-1),                       // high bit set: unsigned handling
    Array[Byte](0, 0),
    Array[Byte](127, -128, 33),
    Array.tabulate(1024)(i => (i * 31).toByte)
  )

  implementations.foreach { case (name, dec) =>
    test(s"$name: total — never throws, including empty and 1-byte payloads") {
      payloads.foreach(p => dec.decode(p))
    }

    test(s"$name: deterministic — equal bytes give equal metadata") {
      payloads.foreach { p =>
        assert(dec.decode(p) == dec.decode(p.clone()))
      }
    }

    test(s"$name: positive dimensions iff payload non-empty; tag never empty") {
      payloads.foreach { p =>
        val (w, h, tag) = dec.decode(p)
        if (p.nonEmpty) assert(w > 0) else assert(w == 0)
        if (p.length > 1) assert(h > 0)
        assert(tag.nonEmpty)
      }
    }

    test(s"$name: serializable — ships inside executor closures") {
      val out = new java.io.ObjectOutputStream(new java.io.ByteArrayOutputStream())
      out.writeObject(dec)
      out.close()
    }
  }

  test("dHash56: decoded-pixel hash equals the generator-formula replay") {
    // the mm_phash_dedup gate's premise: lossless PNG round-trip means
    // the hash computed from REAL ImageIO pixels equals the hash the
    // oracle predicts from dHashCellValue arithmetic
    def formulaHash(grp: Long, vr: Long): Long = {
      var h = 0L
      for (ci <- 0 until Multimodal.DHashCellRows; j <- 0 until Multimodal.DHashCellCols - 1)
        if (Multimodal.dHashCellValue(grp, vr, ci, j + 1) >
          Multimodal.dHashCellValue(grp, vr, ci, j)) h |= 1L << (ci * 8 + j)
      h
    }
    for (grp <- 0L to 6L; vr <- 0L to 1L) {
      val decoded = Multimodal.dHash56(Multimodal.synthCellPng(grp, vr))
      assert(decoded === formulaHash(grp, vr), s"grp=$grp vr=$vr")
      assert(decoded >= 0L) // 56-bit: sign-safe band shifts on both engines
    }
  }

  test("dHash56: planted near-dups sit within the verify threshold, far pairs outside") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    for (grp <- 0L to 20L by 2) { // even groups: variant 1 is a near dup
      val d = ham(
        Multimodal.dHash56(Multimodal.synthCellPng(grp, 0)),
        Multimodal.dHash56(Multimodal.synthCellPng(grp, 1)))
      // 3 perturbed cells in one row touch at most 6 comparisons
      assert(d <= 6, s"even grp=$grp hamming=$d")
    }
    val far = (1L to 21L by 2).map { grp => // odd groups: unrelated image
      ham(
        Multimodal.dHash56(Multimodal.synthCellPng(grp, 0)),
        Multimodal.dHash56(Multimodal.synthCellPng(grp, 1)))
    }
    // far pairs live around the 56/2 expectation; all must clear the 12
    // threshold so the exact verify prunes any chance band collision
    assert(far.forall(_ > 12), s"far hammings: $far")
  }
}
