package graft

import graft.core.{FoldAggregator, MapReduceJob}
import org.apache.spark.sql.Dataset

/** The reference facade's semantics, including the two edge cases the
  * reference itself mishandles (FIXTURES.md §1): empty input (its sink never
  * fires, `/root/reference/Orchestrator.fs:80-88,157-163`) and a single hot
  * key (its worst-case skew). */
class MapReduceJobSpec extends SparkSpec {
  import spark.implicits._

  private def diceJob(rolls: Seq[Int]): MapReduceJob[Int, String, Long] =
    MapReduceJob[Int, String, Long](
      source = s => { import s.implicits._; s.createDataset(rolls) },
      mapFn = r => Seq((if (r == 3) "Win" else "Lose") -> 1L),
      reduceFn = _ + _)

  test("dice-roll job matches an in-memory fold exactly") {
    val rolls = (1 to 10000).map(i => ((i * 48271 + 11) % 2147483647) % 6 + 1)
    val got = diceJob(rolls).collectResults(spark)
    val want = rolls.groupBy(r => if (r == 3) "Win" else "Lose")
      .view.mapValues(_.size.toLong).toMap
    assert(got === want)
  }

  test("empty input yields an empty result (reference stalls forever here)") {
    assert(diceJob(Seq.empty).run(spark).count() === 0)
  }

  test("single hot key (reference's worst-case skew) still correct") {
    val job = MapReduceJob[Int, String, Long](
      source = s => { import s.implicits._; s.createDataset((1 to 5000).toSeq) },
      mapFn = _ => Seq("hot" -> 1L),
      reduceFn = _ + _)
    assert(job.collectResults(spark) === Map("hot" -> 5000L))
  }

  test("result is invariant to shuffle partition count") {
    val rolls = (1 to 2000).map(i => i % 6 + 1)
    val conf = spark.conf
    val before = conf.get("spark.sql.shuffle.partitions")
    try {
      val r1 = diceJob(rolls).collectResults(spark)
      conf.set("spark.sql.shuffle.partitions", "13")
      val r2 = diceJob(rolls).collectResults(spark)
      assert(r1 === r2)
    } finally conf.set("spark.sql.shuffle.partitions", before)
  }

  test("runWithSink passes the lazy dataset to the sink slot") {
    var seen: Option[Long] = None
    diceJob(Seq(1, 2, 3)).runWithSink(spark) { ds: Dataset[(String, Long)] =>
      seen = Some(ds.count())
    }
    assert(seen === Some(2L)) // keys Win + Lose
  }

  test("RDD path (reduceByKey) agrees with the Dataset path") {
    val rolls = (1 to 5000).map(i => ((i * 48271 + 11) % 2147483647) % 6 + 1)
    val job = diceJob(rolls)
    assert(job.runRdd(spark) === job.collectResults(spark))
  }

  test("FoldAggregator reproduces the reference fold signature distributed") {
    val agg = FoldAggregator[Double, (Double, Long), Double](
      (0.0, 0L),
      (b, v) => (b._1 + v, b._2 + 1),
      (a, b) => (a._1 + b._1, a._2 + b._2),
      b => if (b._2 == 0) 0.0 else b._1 / b._2)
    val ds = spark.createDataset(Seq(1.0, 2.0, 3.0, 4.0))
    val got = ds.groupByKey(_ => "all").agg(agg.toColumn).collect()
    assert(got.toSeq === Seq(("all", 2.5)))
  }

  test("frequency counter matches groupBy count") {
    val words = Seq("a", "b", "a", "c", "a", "b")
    val ds = spark.createDataset(words)
    val got = ds.groupByKey(identity).agg(FoldAggregator.counter[String].toColumn)
      .collect().toMap
    assert(got === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }
}
