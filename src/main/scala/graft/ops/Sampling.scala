package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling & splitting for training-data pipelines
  * (SURVEY.md §2.11 extension family).
  *
  * All assignment is pure md5 math over a salted key — no RNG state — so
  * (a) assignments are stable across runs, partitionings, and engines: a
  * document keeps its split forever, the property a training pipeline
  * needs for leak-free held-out sets (`TABLESAMPLE`/`rand()` give
  * neither); (b) split/sample are per-row projections that pipeline with
  * the parquet scan at 100 TB — zero shuffle. Only the per-group quota
  * ranks within groups (one shuffle on the group key, the irreducible
  * cost of a per-group guarantee).
  */
object Sampling {

  /** Stable pseudo-random bucket in [0, buckets): the first 8 hex chars of
    * `md5(salt:key)` as an integer, mod buckets. Identical in any engine
    * with md5 (the DuckDB oracle replays it verbatim).
    */
  def hashBucket(key: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat_ws(":", lit(salt), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Train/valid/test assignment over a 100-bucket hash: bucket < trainPct
    * → "train", < trainPct+validPct → "valid", else "test". Changing the
    * salt re-rolls every assignment; changing percentages only MOVES the
    * boundary (monotone growth of train — documents never swap between
    * valid and train when train expands into valid's range is NOT
    * guaranteed, but train⊂train' when trainPct grows is).
    */
  def hashSplit(
      df: DataFrame,
      key: Column,
      salt: String,
      trainPct: Int,
      validPct: Int
  ): DataFrame = {
    require(trainPct >= 0 && validPct >= 0 && trainPct + validPct <= 100,
      s"percentages must partition [0,100]: train=$trainPct valid=$validPct")
    val b = hashBucket(key, salt, 100)
    df.withColumn(
      "split",
      when(b < trainPct, "train")
        .when(b < trainPct + validPct, "valid")
        .otherwise("test"))
  }

  /** Deterministic Bernoulli sample: keep rows whose bucket falls below
    * keepPct of 100. Same row set every run — resumable sampling jobs
    * re-derive identical subsets.
    */
  def bernoulliKeep(df: DataFrame, key: Column, salt: String, keepPct: Int): DataFrame =
    df.filter(hashBucket(key, salt, 100) < keepPct)

  /** Stratified deterministic sample: a per-stratum keep percentage over
    * the same 100-bucket md5 hash as [[bernoulliKeep]] — the standard
    * rebalancing move for a training mix (downsample the dominant event
    * class, keep the rare one whole) with every guarantee the flat
    * Bernoulli gives: stable across runs/engines, zero shuffle (the
    * stratum rate lookup is a scalar CASE folded into the scan filter),
    * and monotone under rate increases within a stratum. Strata absent
    * from the map keep `defaultPct`.
    */
  def stratifiedKeep(
      df: DataFrame,
      strataCol: Column,
      key: Column,
      salt: String,
      pctByStratum: Map[String, Int],
      defaultPct: Int = 0
  ): DataFrame = {
    (pctByStratum.values ++ Seq(defaultPct)).foreach(p =>
      require(p >= 0 && p <= 100, s"keep pct must be in [0,100]: $p"))
    // deterministic fold order so the generated CASE chain (and thus the
    // plan) is stable run to run
    val rate = pctByStratum.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (stratum, pct)) => when(strataCol === lit(stratum), lit(pct)).otherwise(acc)
    }
    df.filter(hashBucket(key, salt, 100) < rate)
  }

  /** Exact-count mixture rebalancing: downsample each stratum so the
    * output hits TARGET proportions exactly — "make the mix 40% en /
    * 15% each zh·es·de·fr" — keeping as many rows as the limiting
    * stratum allows. The output size N = min over strata of
    * ⌊count·100/share⌋ and each stratum keeps ⌊N·share/100⌋ rows chosen
    * in stable hash order, so unlike [[stratifiedKeep]] (rate-based,
    * proportions only in expectation) the realized mix is exact and
    * deterministic. All arithmetic is integer division, replayable by
    * any engine. Plan: two tiny broadcast aggregates (per-stratum counts
    * → limiting N → per-stratum quotas) + ONE shuffle on the stratum for
    * the in-stratum ranking — the irreducible cost of an exact
    * per-stratum count. Strata absent from `sharePct` are dropped.
    */
  def rebalanceExact(
      df: DataFrame,
      strataCol: String,
      keyCol: String,
      salt: String,
      sharePct: Map[String, Int]
  ): DataFrame = {
    require(sharePct.values.sum == 100, s"target shares must sum to 100: $sharePct")
    require(sharePct.values.forall(_ > 0), s"target shares must be positive: $sharePct")
    val spark = df.sparkSession
    import spark.implicits._
    val shares = sharePct.toSeq.sortBy(_._1).toDF(strataCol, "__share")
    val inMix = df.filter(col(strataCol).isin(sharePct.keys.toSeq: _*))
    // LEFT join from the share table so a stratum named in the target but
    // ABSENT from the data participates with count 0 — making N = 0 (no
    // mix can contain a share of something that does not exist), the
    // honest exact answer, instead of silently renormalizing over the
    // strata that happen to be present
    val withShare = broadcast(shares)
      .join(
        inMix.groupBy(col(strataCol)).agg(count(lit(1)).as("__cnt")),
        Seq(strataCol),
        "left")
      .withColumn("__cnt", coalesce(col("__cnt"), lit(0L)))
    val n = withShare.agg(min(expr("(__cnt * 100) div __share")).as("__n"))
    val quotas = withShare
      .crossJoin(broadcast(n))
      .select(col(strataCol), expr("(__n * __share) div 100").as("__k"))
    val h = md5(concat_ws(":", lit(salt), col(keyCol).cast("string")))
    val w = Window.partitionBy(col(strataCol)).orderBy(h.asc, col(keyCol).asc)
    inMix
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(quotas), strataCol)
      .filter(col("__rn") <= col("__k"))
      .drop("__rn", "__k")
  }

  /** Weight-proportional deterministic Bernoulli: keep a row with
    * probability `min(weight, maxWeight) / maxWeight`, decided by the
    * exact integer comparison `u32 * maxWeight < w * 2^32` over the same
    * 32-bit md5 uniform as [[bernoulliKeep]] — importance sampling for a
    * training mix (e.g. length- or quality-proportional document
    * selection) with zero FP arithmetic, so the kept set is bitwise
    * identical in any engine with md5. Per-row scan filter, zero shuffle.
    * maxWeight ≤ 2^30 keeps both products inside signed-64 range (ANSI
    * overflow would throw, not wrap).
    */
  def weightedKeep(df: DataFrame, key: Column, salt: String, weight: Column, maxWeight: Long): DataFrame = {
    require(maxWeight > 0 && maxWeight <= (1L << 30),
      s"maxWeight must be in [1, 2^30]: $maxWeight")
    val u32 = conv(substring(md5(concat_ws(":", lit(salt), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") // uniform on [0, 2^32)
    val w = least(greatest(weight.cast("long"), lit(0L)), lit(maxWeight))
    df.filter(u32 * maxWeight < w * 4294967296L)
  }

  /** Deterministic negative sampling for contrastive training: place
    * every key on an md5 hash ring, cut the ring into 16^arcHexLen
    * contiguous arcs (the hash prefix), and pair each key with its next
    * `k` successors within the arc, wrapping at the arc end. The pairing
    * is uniform-pseudo-random (ring order is md5 order), deterministic
    * across runs/engines, and fully distributed — each arc is one window
    * partition plus one equi-join on (arc, position), never a global
    * sort. Keys in an arc of size ≤ k get arcSize−1 negatives (self-pairs
    * are dropped), so size arcs to hold ≫ k keys: arcHexLen=2 (256 arcs)
    * for real corpora, 1 for small fixtures.
    */
  def ringNegatives(df: DataFrame, keyCol: String, salt: String, k: Int, arcHexLen: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(arcHexLen >= 1 && arcHexLen <= 8, s"arcHexLen must be in [1,8]: $arcHexLen")
    val h = md5(concat_ws(":", lit(salt), col(keyCol).cast("string")))
    val w = Window.partitionBy("arc").orderBy(col("h"), col("id"))
    val pos = df
      .select(col(keyCol).as("id"), h.as("h"))
      .withColumn("arc", substring(col("h"), 1, arcHexLen))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("arc")))
    pos
      .select(col("arc"), col("id"), col("rn"), col("n"),
        explode(sequence(lit(1L), lit(k.toLong))).as("off"))
      .withColumn("target", (col("rn") - 1 + col("off")) % col("n") + 1)
      .join(pos.select(col("arc"), col("rn").as("target"), col("id").as("neg_id")),
        Seq("arc", "target"))
      .filter(col("neg_id") =!= col("id"))
      .select(col("id"), col("off"), col("neg_id"))
  }

  /** Per-group quota: at most k rows per group, picked by stable hash
    * order (md5 hex of the salted key, key as tie-break) — a deterministic
    * "random k per domain/source", the standard cap against one domain
    * dominating a pretraining mix. One shuffle on the group key.
    */
  def groupCap(
      df: DataFrame,
      groupCol: String,
      keyCol: String,
      k: Int,
      salt: String
  ): DataFrame = {
    val h = md5(concat_ws(":", lit(salt), col(s"`$keyCol`").cast("string")))
    val w = Window.partitionBy(col(s"`$groupCol`")).orderBy(h.asc, col(s"`$keyCol`").asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** UniMax-style budget allocation: split a total training budget across
    * sources as uniformly as possible, with each source capped at
    * `maxEpochs` passes over its own units (tokens/chars). The classic
    * water-filling solution, computed in closed form: sort sources by
    * capacity ascending, find the largest saturated prefix k (every
    * source the level would overflow gets exactly its cap), and give each
    * remaining source the integer water level
    * floor((budget − Σ_sat caps) ÷ (n − k)). All comparisons and the
    * level itself are exact integer arithmetic — engine-portable with no
    * FP in the decision path; the only double is the reported
    * epochs_used ratio.
    *
    * Scale shape: one corpus aggregation to per-source totals, then every
    * window/join runs over |sources| rows — a set that is small by
    * definition (a mixture has tens of sources, not millions), so the
    * single-partition window is bounded regardless of corpus size.
    */
  def unimaxAllocation(
      df: DataFrame,
      srcCol: String,
      unitWeight: Column,
      budget: Long,
      maxEpochs: Int
  ): DataFrame = {
    val caps = df
      .groupBy(col(srcCol).as("source"))
      .agg(sum(unitWeight).as("n_units"))
      .select(col("source"), col("n_units"), (col("n_units") * maxEpochs).as("cap"))
    val w = Window.orderBy(col("cap").asc, col("source").asc)
    val ranked = caps
      .select(
        col("source"), col("n_units"), col("cap"),
        row_number().over(w).as("i"),
        sum(col("cap")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("p"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      // prefix is saturated while handing every remaining source this
      // source's cap still fits the unspent budget
      .withColumn("sat_i",
        when(col("cap") * (col("n") - col("i") + 1) <= lit(budget) - (col("p") - col("cap")), col("i"))
          .otherwise(lit(0L)))
    val kRow = ranked.agg(
      max(col("sat_i")).as("k"),
      max(when(col("sat_i") === col("i"), col("p")).otherwise(lit(0L))).as("pk"))
    ranked
      .crossJoin(broadcast(kRow))
      // `div` is SQL integer division — exact for any budget, unlike
      // floor(double /) which can be off by 1 unit once budget−pk ≥ 2^53.
      // Numerator is non-negative by construction (pk ≤ budget on the
      // saturated prefix), so truncation equals floor.
      .withColumn("level",
        when(col("n") > col("k"), expr(s"(CAST($budget AS BIGINT) - pk) div (n - k)"))
          .otherwise(lit(0L)))
      .select(
        col("source"),
        col("n_units").cast("long").as("n_units"),
        col("cap").cast("long").as("cap"),
        when(col("i") <= col("k"), col("cap")).otherwise(col("level")).cast("long").as("alloc"),
        (when(col("i") <= col("k"), col("cap")).otherwise(col("level")).cast("double") /
          col("n_units").cast("double")).as("epochs_used"))
  }
}
