package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Pins the `mm_phash_dedup` banding completeness bound (VERDICT r18 #5):
  * 4 bands × 14 bits guarantee a candidate only for Hamming ≤ 3
  * (pigeonhole); a mid-Hamming pair whose differing bits touch ALL four
  * bands is deliberately missed (the scale trade documented on
  * [[Multimodal.dhashBandCandidates]]). Both ends of the bound are
  * asserted against the production candidate path, and the planted
  * fixture's near-dups are shown to sit inside the guaranteed radius's
  * single-band locality (why the registered query's recall is complete
  * for ITS fixture even though the general ≤12 verify is not).
  */
class PhashBandSpec extends SparkSpec {
  import spark.implicits._

  private def candidates(pairs: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val rows = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong, a), (i.toLong + 1000L, b))
    }
    Multimodal
      .dhashBandCandidates(rows.toDF("doc_id", "dhash"))
      .as[(Long, Long)]
      .collect()
      .toSet
  }

  test("hamming <= 3 pairs are ALWAYS candidates (pigeonhole guarantee)") {
    val base = 0x00A5C3F00F3C5AL // arbitrary 56-bit value
    // 3 flipped bits, one per band 0..2 — band 3 clean
    val partner = base ^ (1L << 2) ^ (1L << 17) ^ (1L << 30)
    assert(java.lang.Long.bitCount(base ^ partner) === 3)
    assert(candidates(Seq((base, partner))).contains((0L, 1000L)))
  }

  test("cross-band mid-hamming pair (8 bits over all 4 bands) is missed — the documented bound") {
    val base = 0x00A5C3F00F3C5AL
    // two flipped bits in EVERY 14-bit band: no clean band, no candidate,
    // even though Hamming 8 <= the verify threshold 12
    val flips = Seq(1, 9, 15, 26, 29, 40, 44, 54).map(1L << _)
    val partner = flips.foldLeft(base)(_ ^ _)
    assert(java.lang.Long.bitCount(base ^ partner) === 8)
    assert(!candidates(Seq((base, partner))).contains((0L, 1000L)))
  }

  test("mid-hamming pair with one clean band IS a candidate (single-band locality)") {
    val base = 0x00A5C3F00F3C5AL
    // 6 flipped bits confined to bands 0..2; band 3 clean — found
    val flips = Seq(0, 5, 14, 20, 28, 35).map(1L << _)
    val partner = flips.foldLeft(base)(_ ^ _)
    assert(java.lang.Long.bitCount(base ^ partner) === 6)
    assert(candidates(Seq((base, partner))).contains((0L, 1000L)))
  }

  test("planted fixture near-dups stay within one band (recall complete for the fixture)") {
    // even-group variant-1 perturbs 3 cells of row 2 only: dHash bit
    // positions ci*8+j for ci=2 live in 16..23 — entirely inside band 1,
    // so bands 0, 2, 3 are clean and the banding always surfaces them
    for (grp <- 0L to 20L by 2) {
      val a = Multimodal.dHash56(Multimodal.synthCellPng(grp, 0))
      val b = Multimodal.dHash56(Multimodal.synthCellPng(grp, 1))
      val diff = a ^ b
      val bandsTouched = (0 until Multimodal.PhashBands).count { band =>
        ((diff >>> (band * Multimodal.PhashBandBits)) &
          ((1L << Multimodal.PhashBandBits) - 1)) != 0L
      }
      assert(bandsTouched <= 1, s"grp=$grp touched $bandsTouched bands")
    }
  }

  test("audioFp56: the REAL WAV decode reproduces the generator-predicted fingerprint exactly") {
    // the decode path reads true PCM back through javax.sound.sampled;
    // constant-amplitude windows make the decoded sums 16·amp exactly,
    // so the fingerprint is pure arithmetic over audioWindowAmp
    for (grp <- 0L to 6L; v <- 0L to 1L) {
      val decoded = Multimodal.audioFp56(Multimodal.synthToneWav(grp, v))
      var expected = 0L
      for (w <- 0 until Multimodal.AudioFpWindows - 1)
        if (Multimodal.audioWindowAmp(grp, v, w + 1) > Multimodal.audioWindowAmp(grp, v, w))
          expected |= 1L << w
      assert(decoded === expected, s"grp=$grp v=$v")
    }
  }

  test("planted audio near-dups: <=6 bits moved, band 3 always clean (banding recall complete for the fixture)") {
    // even-group variant-1 perturbs windows {3, 22, 41} only → bits
    // {2,3}, {21,22}, {40,41} — bands 0..2; band 3 (bits 42..55) is
    // untouched, so the candidate is guaranteed
    for (grp <- 0L to 20L by 2) {
      val a = Multimodal.audioFp56(Multimodal.synthToneWav(grp, 0))
      val b = Multimodal.audioFp56(Multimodal.synthToneWav(grp, 1))
      val diff = a ^ b
      assert(java.lang.Long.bitCount(diff) <= 6, s"grp=$grp hamming=${java.lang.Long.bitCount(diff)}")
      val band3 = (diff >>> (3 * Multimodal.PhashBandBits)) &
        ((1L << Multimodal.PhashBandBits) - 1)
      assert(band3 === 0L, s"grp=$grp band 3 touched")
    }
    // odd-group variant-1 remixes the whole envelope — far clips that
    // never survive the <=12 verify
    for (grp <- 1L to 21L by 2) {
      val a = Multimodal.audioFp56(Multimodal.synthToneWav(grp, 0))
      val b = Multimodal.audioFp56(Multimodal.synthToneWav(grp, 1))
      assert(java.lang.Long.bitCount(a ^ b) > 12, s"grp=$grp unexpectedly near")
    }
  }
}
