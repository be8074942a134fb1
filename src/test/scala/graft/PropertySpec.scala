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

  test("zValue == naive bit interleave for arbitrary 16-bit pairs") {
    import org.apache.spark.sql.functions.col
    val rng = new Random(2024)
    val pairs = (0 until 200).map(_ =>
      (rng.nextInt(0x10000).toLong, rng.nextInt(0x10000).toLong))
    def naive(a: Long, b: Long): Long =
      (0 until 16).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val got = pairs.toDF("a", "b")
      .select(graft.operators.Layout.zValue(col("a"), col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(got === pairs.map { case (a, b) => naive(a, b) })
  }

  test("bm25TopK == naive in-memory BM25 for arbitrary corpora") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    val vocab = Vector("red", "green", "blue", "cyan", "gold")
    val rng = new Random(77)
    (1 to 3).foreach { _ =>
      val docs = (0 until rng.nextInt(40) + 10).map(i =>
        (i.toLong, List.fill(rng.nextInt(12) + 1)(
          vocab(rng.nextInt(vocab.size))).mkString(" ")))
      val terms = Seq("red", "blue")
      val k = 5
      // naive replica, including the decimal staging contract:
      // stage each term score at scale 18, sum exactly, round to scale 6
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val n = docs.size.toDouble
      val avgdl = toks.values.map(_.size).sum.toDouble / n
      val dfm = terms.map(t =>
        t -> toks.count(_._2.contains(t)).toDouble).toMap
      val naive = docs.flatMap { case (id, _) =>
        val dl = toks(id).size.toDouble
        val ts = terms.filter(t => toks(id).contains(t)).map { t =>
          val tf = toks(id).count(_ == t).toDouble
          val idf = (n - dfm(t) + 0.5) / (dfm(t) + 0.5)
          idf * ((tf * 2.2) / (tf + (1.2 * (0.25 + (0.75 * (dl / avgdl))))))
        }
        if (ts.isEmpty) None
        else Some(id -> ts.map(new JBD(_).setScale(18, RoundingMode.HALF_UP))
          .reduce(_ add _).setScale(6, RoundingMode.HALF_UP).doubleValue())
      }.sortBy { case (id, s) => (-s, id) }.take(k)
      val got = graft.operators.Retrieval
        .bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text", terms, k)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got === naive)
    }
  }

  test("pageRankScaled == naive integer power iteration on random graphs") {
    val rng = new Random(31337)
    (1 to 3).foreach { _ =>
      val nNodes = rng.nextInt(20) + 5
      val edges = (0 until rng.nextInt(40) + nNodes).map(_ =>
        (rng.nextInt(nNodes).toLong, rng.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }.distinct
      if (edges.nonEmpty) {
        val dirE = edges ++ edges.map(_.swap)
        val deg = dirE.groupBy(_._1).view.mapValues(_.size.toLong).toMap
        val nodes = deg.keySet
        val scale = 1000000000000L
        var pr = nodes.map(_ -> scale / nodes.size).toMap
        (1 to 3).foreach { _ =>
          val in = dirE.groupBy(_._2)
          pr = nodes.map { v =>
            val s = in.getOrElse(v, Nil).map { case (u, _) => pr(u) / deg(u) }.sum
            v -> ((15L * scale) / (100L * nodes.size) + (85L * s) / 100L)
          }.toMap
        }
        val got = graft.operators.Graph
          .pageRankScaled(edges.toDF("id_a", "id_b"), iters = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got === pr, s"edges: $edges")
      }
    }
  }

  test("shuffleShards == naive hash permutation for arbitrary id sets") {
    val rng = new Random(555)
    val ids = (0 until 300).map(_ => rng.nextLong().abs % 100000L).distinct
    val nShards = 8
    def rkey(id: Long) = ((id % 1000000007L) * 3266489917L) % 1000000007L
    val want = ids.groupBy(id => (rkey(id) % nShards).toInt).flatMap {
      case (shard, ss) =>
        ss.sortBy(id => (rkey(id), id)).zipWithIndex
          .map { case (id, i) => (id, shard, i + 1) }
    }.toSet
    val got = graft.operators.Curation
      .shuffleShards(ids.toDF("doc_id"), "doc_id", nShards)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === want)
  }

  test("percentRankByDomain == window percent_rank/ntile, any partitioning") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val rng = new Random(404)
    (1 to 3).foreach { round =>
      val domains = Vector("en", "de", "fr", "solo")
      val rows = (0 until rng.nextInt(300) + 30).map(i =>
        (i.toLong, domains(rng.nextInt(if (round == 1) 4 else 3)),
          // coarse scores force ties → id tie-break must match exactly
          rng.nextInt(10) / 10.0)) :+ (9999L, "solo", 0.5)
      val df = rows.toDF("id", "dom", "score")
      val k = rng.nextInt(9) + 2
      val got = graft.operators.Curation
        .percentRankByDomain(df, "dom", "score", "id", k)
        .select("id", "pct_rank", "tile")
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          r.getInt(2).toLong)).toSet
      val w = Window.partitionBy(col("dom")).orderBy(col("score"), col("id"))
      val want = df.select(col("id"),
          percent_rank().over(w).as("p"), ntile(k).over(w).as("t"))
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          r.getInt(2).toLong)).toSet
      assert(got === want, s"k=$k")
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

  test("kCore == naive in-memory peel for random graphs, any partitioning") {
    val rng = new Random(2026)
    (1 to 6).foreach { trial =>
      val n = 20 + rng.nextInt(30)
      val edges = List.fill(80 + rng.nextInt(120))(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      val k = 2 + rng.nextInt(3)
      // naive peel on the canonical undirected simple graph
      var es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.toSet
      var changed = true
      while (changed) {
        val deg = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
          .groupBy(identity).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val nxt = es.filter { case (a, b) => keep(a) && keep(b) }
        changed = nxt.size != es.size
        es = nxt
      }
      val want = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val parts = Seq(1, 3, 17)(trial % 3)
      val got = graft.operators.Graph.kCore(
          edges.toDF("id_a", "id_b").repartition(parts), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"trial=$trial k=$k parts=$parts")
    }
  }

  test("coreness == naive layered peel for random graphs, any partitioning") {
    val rng = new Random(4062)
    (1 to 5).foreach { trial =>
      val n = 15 + rng.nextInt(25)
      val edges = List.fill(60 + rng.nextInt(120))(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
      // naive: repeated k-core peels of the canonical simple graph;
      // coreness(v) = max k whose core still contains v
      def peel(es0: Set[(Long, Long)], k: Int): Set[(Long, Long)] = {
        var es = es0
        var changed = true
        while (changed) {
          val deg = es.toSeq.flatMap { case (a, b) => Seq(a, b) }
            .groupBy(identity).view.mapValues(_.size).toMap
          val keep = deg.filter(_._2 >= k).keySet
          val nxt = es.filter { case (a, b) => keep(a) && keep(b) }
          changed = nxt.size != es.size
          es = nxt
        }
        es
      }
      var es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.toSet
      val want = scala.collection.mutable.Map.empty[Long, Int]
      es.foreach { case (a, b) => want(a) = 1; want(b) = 1 }
      var k = 2
      while (es.nonEmpty) {
        es = peel(es, k)
        es.foreach { case (a, b) => want(a) = k; want(b) = k }
        k += 1
      }
      val parts = Seq(1, 5, 13)(trial % 3)
      val got = graft.operators.Graph.coreness(
          edges.toDF("id_a", "id_b").repartition(parts))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === want.toMap, s"trial=$trial parts=$parts")
    }
  }

  test("SeqSqDistExpr kernel == Column-HOF fold bit-for-bit on random " +
      "float and double vectors (the relation-bank IVF distance)") {
    import org.apache.spark.sql.functions.{aggregate, col, element_at, lit,
      sequence, size}
    val rng = new Random(77)
    def hof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(sequence(lit(1), size(a)), lit(0.0),
        (acc, i) => acc + (element_at(a, i) - element_at(b, i)) *
          (element_at(a, i) - element_at(b, i)))
    (1 to 5).foreach { _ =>
      val d = 1 + rng.nextInt(96)
      val rows = List.fill(60)((
        Seq.fill(d)(rng.nextGaussian()),
        Seq.fill(d)(rng.nextGaussian() * 1e3)))
      val df = rows.toDF("a", "b")
      val got = df.select(graft.functions.VectorExpressions
          .seqSqDist(col("a"), col("b")).as("x"))
        .as[Double].collect().toSeq
      val want = df.select(hof(col("a"), col("b")).as("x"))
        .as[Double].collect().toSeq
      assert(got === want, s"d=$d")
      // float input path (the raw embeddings schema)
      val dfF = rows.map { case (a, b) =>
        (a.map(_.toFloat), b.map(_.toDouble)) }.toDF("a", "b")
      val gotF = dfF.select(graft.functions.VectorExpressions
          .seqSqDist(col("a"), col("b")).as("x"))
        .as[Double].collect().toSeq
      val wantF = dfF.select(hof(col("a").cast("array<double>"), col("b"))
          .as("x")).as[Double].collect().toSeq
      assert(gotF === wantF, s"d=$d (float)")
    }
  }

  test("CenteredDotExpr kernel == Column-HOF projection fold bit-for-bit " +
      "on random vectors and models (the PCA projection)") {
    import org.apache.spark.sql.functions.{aggregate, array, col,
      element_at, lit, sequence, size}
    val rng = new Random(78)
    (1 to 5).foreach { _ =>
      val d = 1 + rng.nextInt(96)
      val mu = Array.fill(d)(rng.nextGaussian())
      val pc = Array.fill(d)(rng.nextGaussian())
      val muLit = array(mu.map(lit): _*)
      val pcLit = array(pc.map(lit): _*)
      val rows = List.fill(60)(Seq.fill(d)(rng.nextGaussian() * 10))
      val df = rows.toDF("v")
      val got = df.select(graft.functions.VectorExpressions
          .centeredDot(col("v"), mu, pc).as("x"))
        .as[Double].collect().toSeq
      val want = df.select(
          aggregate(sequence(lit(0), size(col("v")) - 1), lit(0.0),
            (acc, i) => acc +
              (element_at(col("v"), i + 1) - element_at(muLit, i + 1)) *
                element_at(pcLit, i + 1)).as("x"))
        .as[Double].collect().toSeq
      assert(got === want, s"d=$d")
    }
  }

  test("hllDistinct matches an in-memory replay of the sketch exactly") {
    val rng = new Random(7)
    (1 to 4).foreach { trial =>
      val vals = List.fill(300 + rng.nextInt(3000))(rng.nextInt(2000).toLong)
      val p = 6 + trial                  // 7..10 — different register widths
      val m = 1 << p
      // in-memory replay: same fingerprint, registers, rational estimator
      val regs = scala.collection.mutable.Map.empty[Long, Int]
      vals.foreach { v =>
        val h = graft.functions.GraftKernels.fingerprint64(
          org.apache.spark.unsafe.types.UTF8String.fromString(v.toString))
        val idx = h & (m - 1)
        val rho = graft.functions.GraftKernels.hllRho(h, p)
        regs(idx) = math.max(regs.getOrElse(idx, 0), rho)
      }
      val sp = regs.values.map(mm => BigInt(1) << (63 - mm)).sum +
        BigInt(m - regs.size) * (BigInt(1) << 63)
      val vZero = m - regs.size
      val num = BigInt(7213) * m * 1000 * m * m * (BigInt(1) << 63)
      val den = BigInt(10000) * (1000L * m + 1079) * sp
      val raw = (num / den).toLong
      val want = if (raw <= (2.5 * m).toLong && vZero > 0)
        math.floor(m.toDouble * math.log(m.toDouble / vZero)).toLong
      else raw
      val got = graft.operators.Profiling.hllDistinct(
          vals.toDF("v").withColumn("g",
            org.apache.spark.sql.functions.lit("x")), Seq("g"), "v", p)
        .head().getAs[Long]("n_hll")
      assert(got === want, s"trial=$trial p=$p n=${vals.size}")
    }
  }

  test("countMinSketch estimates match an in-memory replay and never " +
      "undercount") {
    val rng = new Random(41)
    (1 to 3).foreach { trial =>
      val d = 3 + trial % 2
      val w = 1 << (6 + trial)           // 128..512
      val vals = List.fill(500 + rng.nextInt(2000))(rng.nextInt(300).toLong)
      val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // in-memory replay: same per-(key, j) fingerprint and bucket bits
      def bucket(k: Long, j: Int): (Int, Int) = {
        val h = graft.functions.GraftKernels.fingerprint64(
          org.apache.spark.unsafe.types.UTF8String.fromString(s"$k#$j"))
        (j, (h & (w - 1)).toInt)
      }
      val counters = scala.collection.mutable.Map.empty[(Int, Int), Long]
      vals.foreach { v =>
        (0 until d).foreach { j =>
          val b = bucket(v, j)
          counters(b) = counters.getOrElse(b, 0L) + 1
        }
      }
      val probes = (0L until 320L).toList   // includes absent keys 300..319
      val want = probes.map { k =>
        k -> (0 until d).map(j => counters.getOrElse(bucket(k, j), 0L)).min
      }.toMap
      val sk = graft.operators.Profiling.countMinSketch(
        vals.toDF("k").repartition(7), "k", d, w)
      val got = graft.operators.Profiling.countMinLookup(
          probes.toDF("k"), "k", sk, d, w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want, s"trial=$trial d=$d w=$w")
      // the structural CMS guarantee: never under the true count
      probes.foreach { k =>
        assert(got(k) >= exact.getOrElse(k, 0L), s"undercount at key $k")
      }
    }
  }

  test("histogramQuantiles matches an in-memory replay; estimates bracket " +
      "the data; constant column degenerates") {
    import org.apache.spark.sql.functions.col
    val xs = (0 until 1000).map(i => ((i * 37) % 101).toDouble)
    val qs = Seq(0.5, 0.9, 0.99)
    val bins = 16
    val got = graft.operators.Profiling
      .histogramQuantiles(xs.toDF("x").repartition(7), "x", bins, qs)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    // in-memory replay of the documented arithmetic, same IEEE order
    val mn = xs.min; val mx = xs.max; val n = xs.size
    val width = (mx - mn) / bins.toDouble
    val binOf = xs.map(x => math.min(math.floor((x - mn) / width),
      (bins - 1).toDouble).toInt)
    val counts = binOf.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sorted = counts.keys.toSeq.sorted
    val want = qs.map { q =>
      val r = math.ceil(q * n.toDouble).toLong
      var cum = 0L
      val b = sorted.find { b => cum += counts(b); cum >= r }.get
      val cumBefore = cum - counts(b)
      val est = (mn + (b.toDouble * width)) +
        (((r.toDouble - cumBefore.toDouble) / counts(b).toDouble) * width)
      (q, n.toLong, est)
    }
    assert(got.toSeq === want)
    // estimates live inside the data range
    got.foreach { case (_, _, est) => assert(est >= mn && est <= mx) }
    // exact = true: histogram-guided rank-select == a full sort's pick
    val sortedXs = xs.sorted
    val gotExact = graft.operators.Profiling
      .histogramQuantiles(xs.toDF("x").repartition(7), "x", bins, qs,
        exact = true)
      .collect().map(r => (r.getDouble(0), r.getDouble(3)))
    val wantExact = qs.map(q =>
      (q, sortedXs(math.ceil(q * n.toDouble).toInt - 1)))
    assert(gotExact.toSeq === wantExact)
    // constant column: every quantile is the value itself
    val const = graft.operators.Profiling
      .histogramQuantiles(Seq(3.0, 3.0, 3.0).toDF("x"), "x", 8, qs)
      .collect().map(_.getDouble(2)).toSeq
    assert(const === Seq(3.0, 3.0, 3.0))
  }

  test("bounded-bin quantiles == histogramQuantiles under true-min/max " +
      "bounds; per-part count deltas fold to the one-shot; out-of-range " +
      "clamps into edge bins") {
    import graft.operators.Profiling
    val rng = new Random(4242)
    (1 to 5).foreach { _ =>
      val xs = 0.0 :: 999.0 ::
        List.fill(200 + rng.nextInt(400))(rng.nextInt(1000).toDouble)
      val qs = Seq(0.25, 0.5, 0.9, 0.99)
      val bins = 1 + rng.nextInt(32)
      val df = xs.toDF("x").repartition(5)
      val mn = xs.min; val mx = xs.max
      def rows(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
          .toSeq
      // the incremental estimator under the data's own bounds IS the
      // established p80 estimator — same bins, same rank, same IEEE
      // interpolation order
      val viaCounts = rows(Profiling.quantilesFromCounts(
        Profiling.boundedBinCounts(df, "x", bins, mn, mx), bins, mn, mx, qs))
      val direct = rows(Profiling.histogramQuantiles(df, "x", bins, qs))
      assert(viaCounts === direct, s"bins=$bins n=${xs.size}")
      // folded == one-shot: per-part count relations union to the same
      // estimate (the QuantileStream delta-store property)
      val (a, b) = xs.splitAt(xs.size / 3)
      val parts = Profiling.boundedBinCounts(a.toDF("x"), "x", bins, mn, mx)
        .union(Profiling.boundedBinCounts(b.toDF("x"), "x", bins, mn, mx))
      assert(rows(Profiling.quantilesFromCounts(parts, bins, mn, mx, qs))
        === direct)
    }
    // out-of-range values clamp into the edge bins — counted, not dropped
    val cl = Profiling.boundedBinCounts(
        Seq(-5.0, 0.5, 99.0).toDF("x"), "x", 4, 0.0, 10.0)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(cl === Map(0 -> 2L, 3 -> 1L))
    // degenerate bounds: everything lands in bin 0, estimate is the bound
    val const = Profiling.quantilesFromCounts(
        Profiling.boundedBinCounts(Seq(1.0, 7.0).toDF("x"), "x", 8, 3.0, 3.0),
        8, 3.0, 3.0, Seq(0.5))
      .collect().map(_.getDouble(2)).toSeq
    assert(const === Seq(3.0))
  }

  test("vector kernels reject non-float/double array inputs at analysis " +
      "instead of reading garbage at runtime") {
    import graft.functions.VectorExpressions
    import org.apache.spark.sql.functions.col
    val df = Seq((Seq(1, 2, 3), Seq(1.0, 2.0, 3.0))).toDF("vi", "vd")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.seqSqDist(col("vi"), col("vd"))).collect()
    }
    assert(e.getMessage.contains("seq_sq_dist"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorExpressions.cosine(col("vd"), col("vi"))).collect()
    }
    assert(e2.getMessage.contains("cosine_similarity"))
    // the valid paths are untouched: float and double arrays still work
    val ok = df.select(VectorExpressions.cosine(col("vd"), col("vd")))
      .collect().head.getDouble(0)
    assert(math.abs(ok - 1.0) < 1e-12)
  }

  test("ewmaByKey folds each key's timeline in (ts, tie) order and is " +
      "partitioning-invariant") {
    // scrambled input order; user 1's time order is 10.0, 4.0, 2.0
    val rows = Seq((1L, 3L, 2.0), (2L, 1L, 7.0), (1L, 1L, 10.0),
      (1L, 2L, 4.0), (3L, 5L, Double.NaN))
      .toDF("user_id", "ts", "v")
    val got = graft.operators.TimeSeries
      .ewmaByKey(rows.repartition(5), Seq("user_id"), "ts", "ts", "v", 0.125)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // s1=10; s2=0.125*4+0.875*10=9.25; s3=0.125*2+0.875*9.25
    val u1 = (0.125 * 2.0) + (0.875 * ((0.125 * 4.0) + (0.875 * 10.0)))
    assert(got(0) === ((1L, 3L, u1)))
    assert(got(1) === ((2L, 1L, 7.0)))       // single event: seed only
    assert(got(2)._2 === 1L && got(2)._3.isNaN) // NaN value propagates
    // null values and null keys are dropped entirely
    val withNulls = Seq((Some(1L), 1L, Option(5.0)), (Some(1L), 2L, None),
      (None, 3L, Option(9.0))).toDF("user_id", "ts", "v")
    val g2 = graft.operators.TimeSeries
      .ewmaByKey(withNulls, Seq("user_id"), "ts", "ts", "v", 0.125)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(g2.toSeq === Seq((1L, 1L, 5.0)))
  }

  test("funnelStage: strict in-order subsequence match, one step per event") {
    // user 1: click before view never counts; view->click->purchase = 3
    // user 2: view then purchase (no click between) stalls at 1
    // user 3: purchase first never counts; view->click after it = 2
    // user 4: no step-1 event at all -> 0
    val rows = Seq(
      (1L, 1L, "click"), (1L, 2L, "view"), (1L, 3L, "error"),
      (1L, 4L, "click"), (1L, 5L, "purchase"),
      (2L, 1L, "view"), (2L, 2L, "purchase"),
      (3L, 1L, "purchase"), (3L, 2L, "view"), (3L, 3L, "click"),
      (4L, 1L, "error"))
      .toDF("user_id", "ts", "event_type")
    val got = graft.operators.TimeSeries
      .funnelStage(rows.repartition(5), Seq("user_id"), "ts", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 0))
  }

  test("robustOutliers: uniform data flags nothing; a planted spike flags; " +
      "median/MAD match a sorted replay") {
    import org.apache.spark.sql.functions.col
    val uniform = (1 to 1000).map(_.toDouble)
    val flaggedU = graft.operators.Profiling
      .robustOutliers(uniform.toDF("x").repartition(7), "x")
      .filter(col("is_outlier")).count()
    // uniform: max dev = range/2 < 3*1.4826*(range/4) — structurally clean
    assert(flaggedU === 0L)
    val spiked = uniform ++ Seq(1e6, -1e6)
    val out = graft.operators.Profiling
      .robustOutliers(spiked.toDF("x").repartition(7), "x")
    val rows = out.collect()
    val n = spiked.size
    val sortedXs = spiked.sorted
    val med = sortedXs(math.ceil(0.5 * n).toInt - 1)
    val sortedDev = spiked.map(x => math.abs(x - med)).sorted
    val mad = sortedDev(math.ceil(0.5 * n).toInt - 1)
    rows.foreach { r =>
      assert(r.getAs[Double]("median") === med)
      assert(r.getAs[Double]("mad") === mad)
    }
    val flagged = rows.filter(_.getAs[Boolean]("is_outlier"))
      .map(_.getAs[Double]("x")).sorted.toSeq
    assert(flagged === Seq(-1e6, 1e6))
  }

  test("jaccardJoinExact returns EVERY qualifying pair — brute-force set " +
      "equality across thresholds") {
    import org.apache.spark.sql.functions.{array_distinct, col}
    import graft.functions.{TextFunctions => TF}
    val rng = new Random(7)
    val pool = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val docs = (1 to 60).map { i =>
      val nTok = 5 + rng.nextInt(15)
      (i.toLong, Seq.fill(nTok)(pool(rng.nextInt(pool.size))).mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    // brute force over the SAME shingle sets (tokenization parity is
    // covered by the oracle; this test targets the pruning filters)
    val sets = df.select(col("doc_id"),
        array_distinct(TF.tokenShingles(TF.tokens(col("text")), 3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .filter(_._2.nonEmpty)
    for (t <- Seq(0.4, 0.6, 0.8)) {
      val got = graft.operators.Dedup
        .jaccardJoinExact(df.repartition(5), "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        i = (sa & sb).size
        j = i.toDouble / (sa.size + sb.size - i).toDouble if j >= t
      } yield (a, b, j)).toSet
      assert(got === want, s"threshold $t")
    }
  }

  test("containmentJoinExact returns EVERY qualifying directed pair — " +
      "brute-force set equality, planted excerpt included") {
    import org.apache.spark.sql.functions.{array_distinct, col}
    import graft.functions.{TextFunctions => TF}
    val rng = new Random(94)
    val pool = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val base = (1 to 50).map { i =>
      val nTok = 5 + rng.nextInt(15)
      (i.toLong, Seq.fill(nTok)(pool(rng.nextInt(pool.size))).mkString(" "))
    }
    // planted excerpt: doc 100 is a verbatim slice of doc 1 — containment
    // (100 → 1) must be 1.0 while jaccard is small
    val docs = base :+ ((100L, base.head._2.split(" ").take(6).mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val sets = df.select(col("doc_id"),
        array_distinct(TF.tokenShingles(TF.tokens(col("text")), 3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .filter(_._2.nonEmpty)
    for (t <- Seq(0.5, 0.7, 1.0)) {
      val got = graft.operators.Dedup
        .containmentJoinExact(df.repartition(5), "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a != b
        c = (sa & sb).size.toDouble / sa.size.toDouble if c >= t
      } yield (a, b, c)).toSet
      assert(got === want, s"threshold $t")
      if (t <= 1.0) assert(want.exists(p => p._1 == 100L && p._2 == 1L),
        s"planted excerpt must qualify at t=$t")
    }
  }

  test("containmentIncremental == full containment join restricted to " +
      "batch-side probes; corpus only via its index") {
    import org.apache.spark.sql.functions.col
    val rng = new Random(96)
    val pool = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val all = (1 to 60).map { i =>
      val nTok = 5 + rng.nextInt(15)
      (i.toLong, Seq.fill(nTok)(pool(rng.nextInt(pool.size))).mkString(" "))
    }
    val (corpusRows, batchRows0) = all.partition(_._1 <= 40)
    // planted excerpt of a CORPUS doc inside the batch
    val batchRows = batchRows0 :+
      ((999L, corpusRows.head._2.split(" ").take(6).mkString(" ")))
    val corpus = corpusRows.toDF("doc_id", "text")
    val batch = batchRows.toDF("doc_id", "text")
    val index = graft.operators.Dedup.containmentOrderedAll(
      graft.operators.Dedup.jaccardShingleSets(corpus, "doc_id", "text"))
    for (t <- Seq(0.5, 0.8)) {
      val got = graft.operators.Dedup
        .containmentIncremental(batch, index, "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val batchIds = batchRows.map(_._1).toSet
      val want = graft.operators.Dedup
        .containmentJoinExact(corpus.unionAll(batch), "doc_id", "text", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter(p => batchIds.contains(p._1)).toSet
      assert(got === want, s"threshold $t")
      assert(got.exists(p => p._1 == 999L && p._2 == corpusRows.head._1),
        s"planted excerpt must be found at t=$t")
    }
  }

  test("standardize matches a decimal-staged in-memory replay and is " +
      "partitioning-invariant") {
    import org.apache.spark.sql.functions.col
    val vecs = Seq(
      (1L, Seq(1.0f, 2.0f, -0.5f)),
      (2L, Seq(0.25f, -1.0f, 0.75f)),
      (3L, Seq(-0.125f, 4.0f, 0.5f)),
      (4L, Seq(2.5f, 0.0f, 0.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    def replay(): Map[Long, Seq[Double]] = {
      val n = vecs.size
      val dims = 3
      val stats = (0 until dims).map { d =>
        val xs = vecs.map(_._2(d).toDouble)
        // the engine's staging: double -> shortest string -> BigDecimal,
        // exact sum, ONE rounding back to double
        val sd = xs.map(x => BigDecimal(x.toString)).sum.doubleValue
        val s2d = xs.map(x => BigDecimal((x * x).toString)).sum.doubleValue
        val mean = sd / n.toDouble
        val variance = math.max((s2d / n.toDouble) - (mean * mean), 0.0)
        (mean, math.sqrt(variance))
      }
      vecs.map { case (id, v) =>
        id -> v.zipWithIndex.map { case (x, d) =>
          val (m, s) = stats(d)
          if (s == 0.0) 0.0 else (x.toDouble - m) / s
        }.toSeq
      }.toMap
    }
    val want = replay()
    def run(part: Int): Map[Long, Seq[Double]] =
      graft.operators.Similarity.standardize(df.repartition(part))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(run(1) === want)
    assert(run(7) === want)  // decimal staging: order-free, bit-identical
  }

  test("standardize fails loud on ragged vectors instead of emitting nulls") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, -0.5f)),
      (2L, Seq(0.25f, -1.0f)), // one dimension short
      (3L, Seq(-0.125f, 4.0f, 0.5f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      graft.operators.Similarity.standardize(df).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("does not match stats dimension")),
      s"expected the ragged-vector guard to fire, got: $e")
  }
}
