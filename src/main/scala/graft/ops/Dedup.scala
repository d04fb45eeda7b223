package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §2.11): exact, n-gram Jaccard,
  * MinHash+LSH, SimHash. Designed scale-first:
  *
  *  - exact: one hash-shuffle on the content key — the minimal possible.
  *  - n-gram Jaccard: shingle-inverted-index self-join (blocking on shared
  *    shingles) — never materializes the O(n²) pair space; integer-only
  *    arithmetic so results are exactly reproducible.
  *  - MinHash LSH: fixed-width signatures + banding → candidate generation
  *    cost is O(docs × bands), independent of corpus pair count. This is
  *    the 100 TB path; the Jaccard join is the exact verifier on candidates.
  *  - SimHash: 64-bit signature, banded for Hamming-radius candidate
  *    lookup (pigeonhole: d differing bits over b bands ⇒ equal in some
  *    band when d < b).
  */
object Dedup {

  /** Exact dedup: group on a content hash, keep the minimum id. One
    * shuffle on a 128-bit key; at scale this is the canonical
    * hash-partitioned distinct.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-n-gram shingles, exploded to (id, shingle) rows. */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("sid"), explode(TextOps.wordShingles(col(textCol), n)).as("s"))

  /** Near-duplicate pairs by exact n-gram Jaccard ≥ num/den, via the
    * inverted-index join. Output carries the integer evidence
    * (intersection + set sizes) — bitwise reproducible, no FP.
    *
    * Scale note: candidate pairs = Σ_shingle freq² — bounded by shingle
    * selectivity, not corpus². For heavy shingles (stopword n-grams) a
    * production run would drop shingles with document frequency above a
    * cap (they cannot discriminate near-dups anyway); `maxShingleFreq`
    * implements that guard.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      thresholdNum: Int,
      thresholdDen: Int,
      maxShingleFreq: Option[Int] = None
  ): DataFrame = {
    val sh = shingleRows(df, idCol, textCol, n)
    val shFiltered = maxShingleFreq match {
      case Some(cap) =>
        // df-capped inverted index: drop non-discriminative heavy shingles
        val freq = sh.groupBy("s").agg(count(lit(1)).as("df_freq")).filter(col("df_freq") <= cap)
        sh.join(broadcast(freq.select("s")), "s")
      case None => sh
    }
    val sizes = sh.groupBy("sid").agg(count(lit(1)).as("sz"))
    val a = shFiltered.select(col("sid").as("id_a"), col("s"))
    val b = shFiltered.select(col("sid").as("id_b"), col("s"))
    val inter = a
      .join(b, Seq("s"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("sid").as("id_a"), col("sz").as("size_a")), "id_a")
      .join(sizes.select(col("sid").as("id_b"), col("sz").as("size_b")), "id_b")
      .filter(
        col("inter") * thresholdDen >= (col("size_a") + col("size_b") - col("inter")) * thresholdNum
      )
      .select("id_a", "id_b", "inter", "size_a", "size_b")
  }

  /** MinHash signatures: numHashes min-values per doc over per-index
    * rehashes of each shingle (`xxhash64(shingleHash, j)` — an independent
    * hash family per j, deterministic across executors, and ANSI-safe
    * where an affine `a*h+b` would overflow-throw). One explode + one
    * groupBy; signature width is a constant, so the shuffle carries
    * O(docs × numHashes) longs regardless of corpus size.
    */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int,
      numHashes: Int
  ): DataFrame = {
    val sh = shingleRows(df, idCol, textCol, shingleN)
      .select(col("sid"), xxhash64(col("s")).as("h"))
    val mins = (0 until numHashes).map { j =>
      min(xxhash64(col("h"), lit(j))).as(s"m$j")
    }
    sh.groupBy("sid").agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: hash r consecutive signature components per band, emit
    * (band, bandHash) keys, self-join per bucket → candidate pairs.
    * Probability a pair with Jaccard j collides: 1-(1-j^r)^b.
    */
  def lshCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16
  ): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = minhashSignatures(df, idCol, textCol, shingleN, numHashes)
    val bandCols = (0 until bands).map { bIdx =>
      val parts = (0 until r).map(k => col(s"m${bIdx * r + k}"))
      struct(lit(bIdx).as("band"), xxhash64(parts: _*).as("bh"))
    }
    val buckets = sig
      .select(col("sid"), explode(array(bandCols: _*)).as("bk"))
      .select(col("sid"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val l = buckets.select(col("sid").as("id_a"), col("band"), col("bh"))
    val rgt = buckets.select(col("sid").as("id_b"), col("band"), col("bh"))
    l.join(rgt, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** 64-bit SimHash over the token multiset: per bit, sum ±1 across token
    * hashes, bit set where the sum is positive. Expressed as 64 integer
    * aggregates — fully codegen'd, one shuffle on the doc id.
    */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(
      col(idCol).as("sid"),
      explode(TextOps.tokens(normalizeForSimhash(col(textCol)))).as("t")
    )
    val h = xxhash64(col("t"))
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"b$b")
    }
    val sums = tok.groupBy("sid").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64)
      .map(b => when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))
    sums.select(col("sid"), sig.as("simhash"))
  }

  private def normalizeForSimhash(c: Column): Column = TextOps.normalize(c)

  /** SimHash near-dup pairs within a Hamming radius, banded so candidate
    * generation is a hash-join on 16-bit sub-keys (no pair enumeration).
    * Complete for radius < bands by pigeonhole.
    */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      bands: Int = 4
  ): DataFrame = {
    val sig = simhash64(df, idCol, textCol)
    val width = 64 / bands
    val mask = (1L << width) - 1
    val bandCols = (0 until bands).map { i =>
      struct(lit(i).as("band"), shiftright(col("simhash"), i * width).bitwiseAND(lit(mask)).as("bh"))
    }
    val buckets = sig.select(col("sid"), col("simhash"), explode(array(bandCols: _*)).as("bk"))
      .select(col("sid"), col("simhash"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val l = buckets.select(col("sid").as("id_a"), col("simhash").as("sig_a"), col("band"), col("bh"))
    val rgt = buckets.select(col("sid").as("id_b"), col("simhash").as("sig_b"), col("band"), col("bh"))
    l.join(rgt, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
