package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting invariants: stability across runs,
  * partition-count independence, split monotonicity, quota bounds.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.queries.Tables.t(spark, sf("sf0.001"), "documents")

  test("hashSplit is stable across runs and repartitioning, covers all rows") {
    val a = Sampling.hashSplit(docs, col("doc_id"), "s1", 80, 10)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val b = Sampling.hashSplit(docs.repartition(7), col("doc_id"), "s1", 80, 10)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(a == b)
    assert(a.size == docs.count())
    assert(a.map(_._2).subsetOf(Set("train", "valid", "test")))
  }

  test("growing trainPct only adds to train (monotone boundary)") {
    def train(p: Int) = Sampling.hashSplit(docs, col("doc_id"), "s1", p, 5)
      .filter(col("split") === "train").select("doc_id").as[Long].collect().toSet
    val t60 = train(60)
    val t80 = train(80)
    assert(t60.subsetOf(t80))
    assert(t60.size < t80.size)
  }

  test("bernoulliKeep is a subset keyed only by bucket; different salts differ") {
    val keep10 = Sampling.bernoulliKeep(docs, col("doc_id"), "s1", 10)
      .select("doc_id").as[Long].collect().toSet
    val keep30 = Sampling.bernoulliKeep(docs, col("doc_id"), "s1", 30)
      .select("doc_id").as[Long].collect().toSet
    assert(keep10.subsetOf(keep30))
    val other = Sampling.bernoulliKeep(docs, col("doc_id"), "s2", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(other != keep10)
    // ~10% of 50 docs at sf0.001, loose bounds for the hash's variance
    assert(keep10.size < keep30.size && keep30.size < docs.count())
  }

  test("stratifiedKeep = per-stratum Bernoulli at that stratum's rate") {
    val rates = Map("en" -> 10, "de" -> 50)
    val strat = Sampling.stratifiedKeep(docs, col("lang"), col("doc_id"), "s1", rates, defaultPct = 100)
      .select("doc_id", "lang").as[(Long, String)].collect().toSet
    // engine-external replay of the contract: kept iff the first 8 hex
    // chars of md5(salt:key) mod 100 fall below the stratum's rate
    def bucket(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s1:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map(b => f"$b%02x").mkString, 16) % 100
    }
    val all: Set[(Long, String)] = docs.select("doc_id", "lang").as[(Long, String)].collect().toSet
    val expected = all.filter { case (id, lang) => bucket(id) < rates.getOrElse(lang, 100) }
    assert(strat == expected)
    // unmapped strata fall through to defaultPct=100 (kept whole)
    val unmappedAll = docs.filter(!col("lang").isin("en", "de")).count()
    assert(strat.count { case (_, l) => l != "en" && l != "de" } == unmappedAll)
  }

  test("rebalanceExact hits target proportions exactly, deterministically") {
    val shares = Map("en" -> 40, "zh" -> 15, "es" -> 15, "de" -> 15, "fr" -> 15)
    val out = Sampling.rebalanceExact(docs, "lang", "doc_id", "mix", shares)
    val counts = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val inCounts = docs.filter(col("lang").isin(shares.keys.toSeq: _*))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = shares.map { case (g, s) => inCounts(g) * 100 / s }.min
    // every stratum holds exactly its integer quota of the limiting size
    shares.foreach { case (g, s) => assert(counts(g) == n * s / 100, s"$g: $counts") }
    // selection is a stable function of the salt+key, not partitioning
    val again = Sampling.rebalanceExact(docs.repartition(7), "lang", "doc_id", "mix", shares)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("groupCap keeps at most k per group and is deterministic") {
    val capped = Sampling.groupCap(docs, "source", "doc_id", 3, "cap")
    val sizes = capped.groupBy("source").count().as[(String, Long)].collect()
    assert(sizes.forall(_._2 <= 3))
    val again = Sampling.groupCap(docs, "source", "doc_id", 3, "cap")
      .select("doc_id").as[Long].collect().toSet
    assert(again == capped.select("doc_id").as[Long].collect().toSet)
  }

  test("weightedKeep: exact at the extremes, monotone in weight, rate ≈ w/max") {
    val ids = spark.range(2000).toDF("id")
    def kept(w: Long): Set[Long] =
      Sampling.weightedKeep(ids, col("id"), "ws", lit(w), 1024L)
        .select("id").as[Long].collect().toSet
    assert(kept(0L).isEmpty)                 // zero weight: never kept
    assert(kept(1024L).size == 2000)         // full weight: always kept
    assert(kept(5000L).size == 2000)         // above-max weights cap, don't throw
    val k100 = kept(100L)
    val k500 = kept(500L)
    assert(k100.subsetOf(k500))              // for a fixed key, more weight ⊇
    assert(math.abs(k100.size - 2000 * 100 / 1024) < 60, s"${k100.size}")
    assert(math.abs(k500.size - 2000 * 500 / 1024) < 120, s"${k500.size}")
  }

  test("ringNegatives: no self-pairs, k per key in big arcs, stable across partitioning") {
    val ids = spark.range(500).toDF("id")
    val neg = Sampling.ringNegatives(ids, "id", "s1", k = 2, arcHexLen = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(neg.forall { case (id, _, n) => id != n })     // never self
    val perKey = neg.groupBy(_._1).view.mapValues(_.size)
    // 500 keys over 16 arcs → every arc holds ≫ 2 keys, so exactly k each
    assert(perKey.values.toSet == Set(2), perKey.values.toSet.toString)
    assert(perKey.size == 500)
    val again = Sampling.ringNegatives(ids.repartition(7), "id", "s1", k = 2, arcHexLen = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(again == neg)                                   // partition-independent
    // a negative is a ring successor: pairing must be asymmetric for k<arc
    assert(neg.exists { case (id, _, n) => !neg.exists(p => p._1 == n && p._3 == id) })
  }

  test("unimaxAllocation: water-filling saturates small sources, levels the rest") {
    // caps at 2 epochs: a=20, b=60, c=100, d=200. budget 150:
    //   a saturated (20·4=80 ≤ 150); b not (60·3=180 > 130)
    //   level = (150−20)/3 = 43 → allocs: a=20, b=43, c=43, d=43
    val df = Seq(
      ("a", 10L), ("b", 30L), ("c", 50L), ("d", 100L)
    ).flatMap { case (s, u) => Seq((s, u)) }.toDF("source", "units")
    val out = Sampling.unimaxAllocation(df, "source", col("units"), budget = 150L, maxEpochs = 2)
      .select("source", "alloc").as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 20L, "b" -> 43L, "c" -> 43L, "d" -> 43L))
    // budget exceeding total capacity: everyone saturates at cap
    val all = Sampling.unimaxAllocation(df, "source", col("units"), budget = 10000L, maxEpochs = 2)
      .select("source", "alloc").as[(String, Long)].collect().toMap
    assert(all == Map("a" -> 20L, "b" -> 60L, "c" -> 100L, "d" -> 200L))
    // tiny budget: nobody saturates, uniform level floor(150/4)... here 5/4=1
    val tiny = Sampling.unimaxAllocation(df, "source", col("units"), budget = 5L, maxEpochs = 2)
      .select("source", "alloc").as[(String, Long)].collect().toMap
    assert(tiny == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L))
  }
}
