package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The contract every MediaDecoder implementation must satisfy (see the
  * trait's scaladoc). A real javacv/ffmpeg backend plugs in by adding its
  * instance to `implementations` — the same assertions then gate it.
  */
class MediaDecoderContractSpec extends AnyFunSuite {

  private val implementations: Seq[(String, Multimodal.MediaDecoder)] =
    Seq("FakeDecode" -> Multimodal.FakeDecode, "ImageIoDecode" -> Multimodal.ImageIoDecode)

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

  test("ImageIoDecode: non-image bytes fall back deterministically with an undecodable tag") {
    val junk = "not an image at all".getBytes("UTF-8")
    val (w, h, tag) = Multimodal.ImageIoDecode.decode(junk)
    assert(tag == "undecodable")
    assert(w > 0 && h > 0)
    assert(Multimodal.ImageIoDecode.decode(junk.clone()) == ((w, h, tag)))
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
}
