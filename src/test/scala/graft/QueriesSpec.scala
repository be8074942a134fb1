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
