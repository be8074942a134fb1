package graft

/** Smoke-level assertions over the whole registry at sf0.001: every query
  * runs, returns rows, and every oracle key points at a real query. (Value
  * correctness is the driver's DuckDB gate + scripts/localcheck.py.) */
class QueriesSpec extends SparkSpec {

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracles without queries: $extra")
  }

  test("approx_count_distinct stays within its error bound of exact") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val Array(approx, exact) = li
      .agg(approx_count_distinct(col("l_orderkey")).as("a"),
        countDistinct(col("l_orderkey")).as("e"))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx $approx vs exact $exact")
  }

  test("stratified sampling: deterministic, nested, per-stratum rates") {
    import org.apache.spark.sql.functions._
    import graft.operators.Curation
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def ids(fr: Map[String, Double], dflt: Double): Set[Long] =
      Curation.sampleStratified(docs, "doc_id", "lang", fr, dflt)
        .select("doc_id").as[Long].collect().toSet
    val half = ids(Map("en" -> 0.5), 0.2)
    // deterministic: same call, same rows — and partitioning-independent
    assert(ids(Map("en" -> 0.5), 0.2) === half)
    val halfRepart = Curation.sampleStratified(docs.repartition(13), "doc_id",
        "lang", Map("en" -> 0.5), 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(halfRepart === half, "sample must not depend on partitioning")
    // nested: the smaller-fraction sample is a strict subset
    val tenth = ids(Map("en" -> 0.1), 0.04)
    assert(tenth.subsetOf(half), "smaller fractions must nest inside larger")
    // per-stratum rate lands near the requested share
    val en = docs.filter(col("lang") === "en").count().toDouble
    val enKept = docs.filter(col("lang") === "en")
      .filter(col("doc_id").isin(half.toSeq: _*)).count().toDouble
    assert(math.abs(enKept / en - 0.5) < 0.15,
      s"en sampled at ${enKept / en}, wanted ~0.5")
  }

  test("domainMix: hits target proportions, binding domain kept whole, " +
      "unlisted domains dropped") {
    import org.apache.spark.sql.functions._
    import graft.operators.Curation
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select("doc_id", "lang")
    val targets = Map("en" -> 0.5, "de" -> 0.5)
    val mixed = Curation.domainMix(docs, "doc_id", "lang", targets)
    val got = mixed.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    // only listed domains survive
    assert(got.keySet.subsetOf(Set("en", "de")))
    // deterministic: identical rows on a second run
    val again = Curation.domainMix(docs, "doc_id", "lang", targets)
      .select("doc_id").as[Long].collect().toSet
    assert(again === mixed.select("doc_id").as[Long].collect().toSet)
    // the scarcer domain binds: it keeps (nearly) everything, and the
    // abundant one downsamples to roughly the same size (equal targets)
    val full = docs.filter(col("lang").isin("en", "de"))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val binding = if (full("en") < full("de")) "en" else "de"
    assert(got(binding) >= (full(binding) * 0.95).toLong,
      s"binding domain should keep ~all rows: $got vs $full")
    val other = if (binding == "en") "de" else "en"
    // wide tolerance: at sf0.001 the downsampled domain holds ~70 rows, so
    // multiplicative-hash bucket variance alone is ~±2.5σ ≈ ±25%
    assert(math.abs(got(other) - got(binding).toDouble) <=
      0.35 * got(binding), s"equal targets should balance: $got")
  }

  test("packChunks: blocked prefix sum equals the naive global cumsum, " +
      "straddlers and empty docs included") {
    import org.apache.spark.sql.functions._
    import graft.operators.Curation
    import spark.implicits._
    // ids with gaps, a zero-token doc, and a doc longer than a whole chunk
    val docs = Seq((0L, 3L), (1L, 0L), (5L, 25L), (6L, 4L), (17L, 9L),
      (18L, 1L), (40L, 7L), (41L, 12L)).toDF("id", "n")
    val got = Curation.packChunks(docs, "id", col("n"),
        chunkTokens = 10, blockIds = 4)
      .orderBy("id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // naive reference: running offset in id order
    var off = 0L
    val want = Seq((0L, 3L), (1L, 0L), (5L, 25L), (6L, 4L), (17L, 9L),
      (18L, 1L), (40L, 7L), (41L, 12L)).map { case (id, n) =>
      val start = off; off += n
      val chunk = start / 10
      val span = if (n > 0) (start + n - 1) / 10 - chunk + 1 else 0L
      (id, n, start, chunk, span)
    }
    assert(got === want)
    // straddlers: the 25-token doc covers chunks 0-2; the 12-token doc
    // starts at offset 49 and covers chunks 4-6
    assert(got.find(_._1 == 5L).get._5 === 3)
    assert(got.find(_._1 == 41L).get._5 === 3)
  }

  test("every query runs and returns rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sfDir).count()
        if (n == 0) Some(name) else None
    }
    // LSH/minhash pair queries may legitimately be empty at tiny sf — but
    // nothing else may.
    val allowedEmpty = Set("p08_dedup_minhash", "p09_dedup_simhash",
      "p11_embed_neardup")
    assert((empties.toSet -- allowedEmpty).isEmpty,
      s"unexpectedly empty: ${empties.toSet -- allowedEmpty}")
  }
}
