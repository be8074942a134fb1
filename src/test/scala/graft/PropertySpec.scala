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

  test("packChunks == naive prefix sum for arbitrary ids/counts/blocks") {
    import org.apache.spark.sql.functions.col
    val rng = new Random(99)
    (1 to 5).foreach { _ =>
      // sparse non-negative ids, token counts 0..50, random block size
      val rows = (0 until rng.nextInt(300) + 1)
        .map(_ => rng.nextLong().abs % 10000)
        .distinct.sorted
        .map(id => (id, rng.nextInt(51).toLong))
      val budget = rng.nextInt(100) + 1
      val blockIds = rng.nextInt(500) + 1
      val got = graft.operators.Curation.packChunks(
          rows.toDF("id", "n"), "id", col("n"), budget, blockIds)
        .orderBy("id")
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
      var off = 0L
      val want = rows.map { case (id, n) =>
        val start = off; off += n
        val chunk = start / budget
        val span = if (n > 0) (start + n - 1) / budget - chunk + 1 else 0L
        (id, n, start, chunk, span)
      }
      assert(got === want, s"budget=$budget blockIds=$blockIds")
    }
  }

  test("saltedJoin == plain join for arbitrary key skew and salt counts") {
    val rng = new Random(123)
    (1 to 5).foreach { _ =>
      val left = (0 until rng.nextInt(500) + 50)
        .map(i => (rng.nextInt(6).toLong, i.toLong)).toDF("k", "lv")
      val right = (0 until rng.nextInt(30) + 1)
        .map(i => (rng.nextInt(10).toLong, i.toLong)).toDF("k", "rv")
      val salts = rng.nextInt(8) + 1
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "lv", "rv").as[(Long, Long, Long)]
          .collect().toSeq.sorted
      assert(canon(graft.operators.Skew.saltedJoin(
          left, right, Seq("k"), salts)) === canon(left.join(right, "k")),
        s"salts=$salts")
    }
  }
}
