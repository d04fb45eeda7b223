package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The contract every MediaDecoder implementation must satisfy (see the
  * trait's scaladoc). A real javacv/ffmpeg backend plugs in by adding its
  * instance to `implementations` — the same assertions then gate it.
  */
class MediaDecoderContractSpec extends AnyFunSuite {

  private val implementations: Seq[(String, Multimodal.MediaDecoder)] =
    Seq("FakeDecode" -> Multimodal.FakeDecode)

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
