package graft

import graft.core.MapReduceJob
import scala.util.Random

/** Property tests for the generic map/shuffle/reduce core (SURVEY.md §5.3):
  * for commutative-associative folds over arbitrary inputs, the distributed
  * result equals a single-threaded in-memory fold, independent of partition
  * count. Inputs are seeded-random (deterministic across runs). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val keys = Vector("a", "b", "c", "d", "hot")

  private def randomKvs(rng: Random): List[(String, Long)] =
    List.fill(rng.nextInt(200))(
      (keys(rng.nextInt(keys.size)), rng.nextLong() % 100))

  test("engine fold == in-memory fold for arbitrary KV inputs (sum)") {
    val rng = new Random(42)
    (1 to 15).foreach { _ =>
      val kvs = randomKvs(rng)
      val job = MapReduceJob[(String, Long), String, Long](
        source = s => { import s.implicits._; s.createDataset(kvs) },
        mapFn = kv => Seq(kv),
        reduceFn = _ + _)
      val want = kvs.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      assert(job.collectResults(spark) === want, s"input: $kvs")
    }
  }

  test("engine fold == in-memory fold (max — non-invertible monoid)") {
    val rng = new Random(1234)
    (1 to 10).foreach { _ =>
      val kvs = randomKvs(rng)
      val job = MapReduceJob[(String, Long), String, Long](
        source = s => { import s.implicits._; s.createDataset(kvs) },
        mapFn = kv => Seq(kv),
        reduceFn = math.max)
      val want = kvs.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(job.collectResults(spark) === want, s"input: $kvs")
    }
  }

  test("flatMap fan-out (0..n pairs per record) preserves fold semantics") {
    val rng = new Random(99)
    (1 to 10).foreach { _ =>
      val ns = List.fill(rng.nextInt(300))(rng.nextInt(6))
      val job = MapReduceJob[Int, String, Long](
        source = s => { import s.implicits._; s.createDataset(ns) },
        mapFn = n => (0 until n).map(i => s"k${i % 3}" -> 1L), // 0 pairs = filter
        reduceFn = _ + _)
      val want = ns.flatMap(n => (0 until n).map(i => s"k${i % 3}"))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(job.collectResults(spark) === want)
    }
  }

  test("result invariant across partition counts (2, 7, 32)") {
    val rng = new Random(7)
    val kvs = randomKvs(rng)
    val results = Seq("2", "7", "32").map { p =>
      spark.conf.set("spark.sql.shuffle.partitions", p)
      try {
        MapReduceJob[(String, Long), String, Long](
          source = s => { import s.implicits._; s.createDataset(kvs) },
          mapFn = kv => Seq(kv),
          reduceFn = _ + _).collectResults(spark)
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    assert(results.distinct.size === 1)
  }
}
