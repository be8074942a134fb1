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

    def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) => runOnce(fn) }       // warmup sweep
    val results = ordered.map { case (name, fn) =>
      val times = (1 to passes).map(_ => runOnce(fn)).sorted
      name -> times(times.size / 2)                       // median
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
