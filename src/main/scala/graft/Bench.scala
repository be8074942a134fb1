package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Measurement discipline (round-3 hardening):
  *   - The timed action is a `format("noop")` write, not `count()` — under a
  *     count Catalyst prunes every column (no values needed), so pure
  *     projection/scalar queries would measure little more than the scan.
  *     The noop sink evaluates every output row and column, then discards
  *     them: the measured work is the declared work, with zero sink I/O.
  *   - Median of 3 timed passes per query, after one untimed warmup sweep
  *     (JIT, whole-stage-codegen class compilation, parquet footer cache).
  *     A single pass on a shared machine has run-to-run variance larger than
  *     most real regressions (round 2's q03–q06 read 3–5× slower with no
  *     code change); the median suppresses one-off scheduler stalls.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // None = the pass threw; failures must never mix into the timing stats
    // (a -1.0 sentinel inside a sorted median silently hides one bad pass
    // and makes an always-failing query look like a timing)
    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch { case _: Throwable => None }
    }

    // dev loop: SPARK_GRAFT_BENCH_ONLY=p24_neardup_clusters,q16_... times a
    // subset without paying for the whole registry
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    ordered.foreach { case (_, fn) => runOnce(fn) }       // warmup sweep
    val results = ordered.map { case (name, fn) =>
      val passResults = (1 to passes).map(_ => runOnce(fn))
      val ok = passResults.flatten.sorted
      val fails = passResults.count(_.isEmpty)
      (name, ok, fails)
    }
    def fmt(v: Double, scale: Int) = BigDecimal(v).setScale(scale, BigDecimal.RoundingMode.HALF_UP)
    def qmap(scale: Int) = results.map { case (name, ok, _) =>
      val med = if (ok.isEmpty) -1.0 else ok(ok.size / 2)
      s"\"$name\":${fmt(med, scale)}"
    }.mkString("{", ",", "}")
    val spread = results.collect { case (name, ok, _) if ok.nonEmpty =>
      s"\"$name\":[${fmt(ok.head, 4)},${fmt(ok(ok.size / 2), 4)},${fmt(ok.last, 4)}]"
    }.mkString("{", ",", "}")
    val failures = results.collect { case (name, _, fails) if fails > 0 =>
      s"\"$name\":$fails"
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, ok, _) if ok.nonEmpty => ok(ok.size / 2) }.sum
    // Two lines, detail first, contract line LAST:
    //   1. "total_detail" — 4-decimal medians + [min, median, max] spread +
    //      per-query failure counts for EVERY query, for human/judge
    //      reading (grep "total_detail" in the bench log).
    //   2. "total" — the driver contract {"metric",...,"queries",...}. It
    //      is deliberately the final stdout line (build.sbt suppresses
    //      sbt's success banner) and MUST fit, whole, inside the driver's
    //      last-N-chars tail capture: BENCH_r04's "tail" field is exactly
    //      2000 chars, and rounds 1-4 all recorded "parsed": null from
    //      overflowing it. At 118 registry queries a complete per-query
    //      map is ~2.8k chars, so the contract line carries the SLOWEST
    //      queries first and rolls the remainder into one "_others" entry
    //      (the map still sums to "value"), budgeted to 1800 chars.
    println(s"""{"metric":"total_detail","value":${fmt(total, 4)},"unit":"sec","queries":${qmap(4)},"spread":$spread,"failures":$failures,"sf":"$sfDir"}""")
    val budget = 1800
    val overhead = s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","queries":{},"sf":"$sfDir"}""".length + 40
    val byCost = results.collect { case (name, ok, _) if ok.nonEmpty =>
      (name, ok(ok.size / 2)) }.sortBy(-_._2)
    // queries that failed EVERY pass lead the line as -1.0 sentinels — a
    // broken query must never be indistinguishable from an absent one
    val broken = results.collect { case (name, ok, _) if ok.isEmpty =>
      s"\"$name\":-1.0" }
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = overhead
    var othersSum = 0.0
    // broken sentinels obey the same budget as timed entries (a mass
    // failure must not overflow the tail window this line exists to fit);
    // overflow rolls into one "_broken" count
    var brokenDropped = 0
    broken.foreach { e =>
      if (used + e.length + 1 <= budget) { entries += e; used += e.length + 1 }
      else brokenDropped += 1
    }
    if (brokenDropped > 0) {
      val e = s"\"_broken\":$brokenDropped"
      entries += e; used += e.length + 1
    }
    var timedShown = 0
    byCost.foreach { case (name, med) =>
      val e = s"\"$name\":${fmt(med, 2)}"
      if (used + e.length + 1 <= budget) { entries += e; used += e.length + 1; timedShown += 1 }
      else othersSum += med
    }
    // compare against the count of INCLUDED timed entries (entries also
    // holds broken sentinels) so 0.00-median exclusions still surface
    if (othersSum > 0 || byCost.size > timedShown)
      entries += s"\"_others\":${fmt(othersSum, 2)}"
    val contractQ = entries.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","queries":$contractQ,"sf":"$sfDir"}""")
    spark.stop()
  }
}
