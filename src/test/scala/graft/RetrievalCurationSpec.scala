package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Profiling, Retrieval}
import graft.functions.{TextFunctions => TF}

/** Semantics of the round-5 curation additions: BM25 retrieval, canonical
  * cluster selection, column profiling, sharded shuffle, PII scrubbing. */
class RetrievalCurationSpec extends SparkSpec {
  import spark.implicits._

  test("bm25TopK ranks rare-term and high-tf docs first, bounds k") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry cherry"),
      (3L, "durian durian durian"),
      (4L, "banana banana banana banana")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("apple", "banana"), 10).collect()
    // doc 3 has no query term: absent entirely (vocab filter before tf agg)
    assert(!got.map(_.getLong(0)).contains(3L))
    assert(got.map(_.getLong(0)).length === 3)
    // scores strictly descending in output order
    val scores = got.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // doc 1 carries the only 'apple' (df=1 → idf 2.5/1.5) plus a banana:
    // must outrank the banana-only docs (banana df=3 → idf 1.5/3.5)
    assert(got.head.getLong(0) === 1L)
    // k bound respected
    assert(Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("banana"), 2).count() === 2)
  }

  test("bm25TopK: higher tf wins within one term at equal doc length") {
    val docs = Seq(
      (1L, "x banana y z"),
      (2L, "banana banana y z")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("banana"), 10)
      .collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(2L, 1L))
  }

  test("canonicalPerCluster keeps best-score member, ties to min id") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val scored = Seq(
      (1L, 0.5), (2L, 0.9), (3L, 0.9), (5L, 0.1), (6L, 0.1), (9L, 1.0))
      .toDF("doc_id", "quality")
    val got = Dedup.canonicalPerCluster(edges, scored, "doc_id", "quality")
      .orderBy("cluster_id").collect()
    // doc 9 is not in any cluster → not selected (corpus never joins whole)
    assert(got.length === 2)
    val c1 = got(0)
    assert(c1.getAs[Long]("cluster_id") === 1L)
    assert(c1.getAs[Long]("keep_id") === 2L) // 0.9 tie with 3 → min id
    assert(c1.getAs[Long]("n_members") === 3L)
    assert(c1.getAs[Double]("quality") === 0.9)
    val c2 = got(1)
    assert(c2.getAs[Long]("cluster_id") === 5L)
    assert(c2.getAs[Long]("keep_id") === 5L)
    assert(c2.getAs[Long]("n_members") === 2L)
  }

  test("profile reports rows/nulls/ndv/min/max per column") {
    val df = Seq(
      (Option(1.0), 10L), (None, 20L), (Option(1.0), 30L), (Option(4.0), 20L))
      .toDF("x", "y")
    val got = Profiling.profile(df, Seq("x", "y")).collect()
    assert(got.length === 2)
    val x = got.find(_.getString(0) == "x").get
    assert(x.getAs[Long]("n_rows") === 4L)
    assert(x.getAs[Long]("n_nulls") === 1L)
    assert(x.getAs[Long]("n_distinct") === 2L)
    assert(x.getAs[Double]("min_value") === 1.0)
    assert(x.getAs[Double]("max_value") === 4.0)
    val y = got.find(_.getString(0) == "y").get
    assert(y.getAs[Long]("n_nulls") === 0L)
    assert(y.getAs[Long]("n_distinct") === 3L)
    // approx variant: same shape, sketch-based ndv stays plausible
    val approx = Profiling.profile(df, Seq("y"), exact = false).collect()
    assert(approx.length === 1 && approx.head.getAs[Long]("n_distinct") >= 2L)
  }

  test("shuffleShards is a reproducible partitioned permutation") {
    val ids = (0L until 100L).toDF("doc_id")
    val a = Curation.shuffleShards(ids, "doc_id", 8)
    val rows = a.collect()
    // every id exactly once
    assert(rows.map(_.getLong(0)).sorted.toSeq === (0L until 100L))
    // positions are 1..count within each shard
    rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq === (1 to rs.length))
    }
    // deterministic across runs
    val b = Curation.shuffleShards(ids, "doc_id", 8).collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet ===
      b.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet)
  }

  test("inverted index probe = direct BM25 bit-for-bit; df agg shuffle-free") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val terms = Seq("spark", "vector", "window")
    val direct = Retrieval.bm25TopK(docs, "doc_id", "text", terms, 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    Retrieval.writeInvertedIndex(docs, "doc_id", "text", "bm25_idx_spec",
      buckets = 4)
    val probed = Retrieval.bm25TopKIndexed(spark, "bm25_idx_spec", "doc_id",
      terms, 20).collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probed === direct)

    // term-bucketed layout: the document-frequency aggregation over the
    // persisted postings must run with NO shuffle exchange
    val dfAgg = spark.table("bm25_idx_spec").groupBy("term").count()
    dfAgg.collect()
    val plan = dfAgg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"term-keyed aggregation over the persisted postings still shuffles:\n$plan")
  }

  test("slidingWindows: overlap, stride, short tail, empty docs dropped") {
    val docs = Seq(
      (1L, "a b c d e"), // 5 tokens, win=3 stride=2 → starts 0,2,4
      (2L, "")).toDF("doc_id", "text")
    val got = Curation.slidingWindows(docs, "doc_id",
        TF.tokens(col("text")), winTokens = 3, stride = 2)
      .orderBy("doc_id", "win_id").collect()
    assert(got.map(r => (r.getLong(0), r.getInt(1), r.getString(2),
      r.getInt(3))).toSeq === Seq(
      (1L, 0, "a b c", 3),
      (1L, 1, "c d e", 3),
      (1L, 2, "e", 1)))
  }

  test("pageRankScaled: symmetry, centrality, mass, partition-determinism") {
    import graft.operators.Graph
    // triangle: perfect symmetry → identical ranks, total mass ≈ scale
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("id_a", "id_b")
    val triPr = Graph.pageRankScaled(tri, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(triPr.values.toSet.size === 1, s"triangle ranks differ: $triPr")
    val mass = triPr.values.sum
    assert(math.abs(mass - 1000000000000L) < 1000L,
      s"rank mass drifted: $mass")

    // star: the center outranks the (equal-ranked) leaves
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("id_a", "id_b")
    val starPr = Graph.pageRankScaled(star, iters = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(starPr(1L) > starPr(2L), s"center must outrank leaves: $starPr")
    assert((2L to 5L).map(starPr).toSet.size === 1,
      s"leaves must rank equally: $starPr")

    // integer arithmetic → bit-identical under a different partitioning
    val again = Graph.pageRankScaled(star.repartition(7), iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again === starPr)
  }

  test("histogram: closed last bin, constant column, nulls excluded") {
    val df = Seq(Option(0.0), Option(5.0), Option(10.0), None).toDF("x")
    val got = Profiling.histogram(df, "x", 2).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // bins are half-open [lo, hi): 5.0 opens bin 1; x=10 (the max) clamps
    // into the last bin; the null row is dropped
    assert(got.toSeq === Seq((0, 0.0, 5.0, 1L), (1, 5.0, 10.0, 2L)))
    // constant column: everything lands in bin 0
    val const = Seq(3.0, 3.0, 3.0).toDF("x")
    val c = Profiling.histogram(const, "x", 4).collect()
    assert(c.length === 1 && c.head.getInt(0) === 0 && c.head.getLong(3) === 3L)
  }

  test("zValue interleaves bits; zOrdered plans a range partition on zval") {
    import graft.operators.Layout
    val got = Seq((1L, 0L), (0L, 1L), (3L, 3L), (0xFFFFL, 0L))
      .toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a fills even bit positions, b odd: z(1,0)=1, z(0,1)=2, z(3,3)=15,
    // z(0xFFFF,0) = 0x55555555
    assert(got === Seq(1L, 2L, 15L, 0x55555555L))

    val df = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val plan = Layout.zOrdered(df, col("a"), col("b"), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(zval"),
      s"zOrdered must range-partition by zval:\n$plan")
  }

  test("bloom prefilter keeps every member and prunes most non-members") {
    import graft.functions.BloomFunctions
    val members = (0L until 500L).map(i => s"member_$i").toDF("s")
    val bloom = members
      .agg(BloomFunctions.bloomAgg(xxhash64(col("s")), 1000L, 10000L))
      .head().getAs[Array[Byte]](0)
    // no false negatives, ever
    val kept = members.filter(
      BloomFunctions.mightContain(lit(bloom), xxhash64(col("s")))).count()
    assert(kept === 500L)
    // ~10 bits/item → false-positive rate ~1%; 5000 strangers should
    // overwhelmingly prune
    val strangers = (0L until 5000L).map(i => s"stranger_$i").toDF("s")
    val fp = strangers.filter(
      BloomFunctions.mightContain(lit(bloom), xxhash64(col("s")))).count()
    assert(fp < 250L, s"false-positive count too high: $fp")
  }

  test("compact rewrites a many-file dataset into size-targeted files") {
    import graft.operators.Layout
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact")
    val in = s"$tmp/in"
    val out = s"$tmp/out"
    (0L until 1000L).toDF("id").repartition(16).write.parquet(in)
    def parquetFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(in) === 16)
    Layout.compact(spark, in, out, targetFileBytes = 1L << 30)
    assert(parquetFiles(out) === 1, "1 GiB target must yield a single file")
    // lossless: same multiset of rows
    assert(spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
      === (0L until 1000L))
  }

  test("redactPii replaces emails, phones, IPv4s and counts them") {
    val df = Seq(
      "mail me at a.b@x.co or +44-123-4567 from 192.168.0.1",
      "nothing sensitive here").toDF("t")
    val got = df.select(
      TF.redactPii(col("t")).as("r"),
      TF.piiCount(col("t"), TF.emailPattern).as("e"),
      TF.piiCount(col("t"), TF.phonePattern).as("p"),
      TF.piiCount(col("t"), TF.ipv4Pattern).as("i")).collect()
    assert(got(0).getString(0) ===
      "mail me at <EMAIL> or <PHONE> from <IP>")
    assert((got(0).getInt(1), got(0).getInt(2), got(0).getInt(3)) === ((1, 1, 1)))
    assert(got(1).getString(0) === "nothing sensitive here")
    assert((got(1).getInt(1), got(1).getInt(2), got(1).getInt(3)) === ((0, 0, 0)))
  }

  test("upsert: incoming replaces, unmatched survive, NULL data col wins") {
    val existing = Seq(
      (1L, Some("old-a"), 10),
      (2L, Some("old-b"), 20),
      (3L, Some("old-c"), 30)).toDF("id", "txt", "n")
    val incoming = Seq(
      (2L, Some("new-b"), 21),          // replaces id=2
      (3L, None: Option[String], 31),   // NULL data col must WIN over old-c
      (9L, Some("new-i"), 90)).toDF("id", "txt", "n")
    val got = Curation.upsert(existing, incoming, Seq("id"))
      .orderBy("id").collect()
    assert(got.map(r => (r.getLong(0),
      Option(r.getString(1)), r.getInt(2))).toSeq === Seq(
      (1L, Some("old-a"), 10),
      (2L, Some("new-b"), 21),
      (3L, None, 31),
      (9L, Some("new-i"), 90)))
    // column order preserved; schema requirement enforced
    assert(got.head.schema.fieldNames.toSeq === Seq("id", "txt", "n"))
    intercept[IllegalArgumentException] {
      Curation.upsert(existing, incoming.select("txt", "id", "n"), Seq("id"))
    }
  }

  test("withObservedStats: metrics ride the action, no second scan") {
    val df = Seq((1L, Some("a")), (2L, None: Option[String]),
      (3L, Some("c")), (4L, None: Option[String])).toDF("id", "v")
    val (instrumented, obs) = Profiling
      .withObservedStats(df.filter(col("id") =!= 3L), "dq", Seq("v"))
    // the instrumented frame computes the same result...
    assert(instrumented.count() === 3)
    // ...and the metrics were accumulated by that very action
    val m = obs.get
    assert(m("rows") === 3L)
    assert(m("nulls_v") === 2L)
  }

  test("importanceSample: 0 drops all, 1 keeps all, monotone, on-rate") {
    val df = (0L until 2000L).toDF("id")
    def sample(w: Double) = Curation
      .importanceSample(df.withColumn("w", lit(w)), "id", col("w"))
      .select("id").as[Long].collect().toSet
    assert(sample(0.0).isEmpty)
    assert(sample(1.0).size === 2000)
    val (half, more) = (sample(0.5), sample(0.8))
    // same id hash, growing threshold: higher weight strictly widens
    assert(half.subsetOf(more))
    assert(math.abs(half.size / 2000.0 - 0.5) < 0.05, s"rate ${half.size}")
    assert(math.abs(more.size / 2000.0 - 0.8) < 0.05, s"rate ${more.size}")
  }

  test("weightedSampleK: fixed budget, no replacement, weight-sensitive, deterministic") {
    val df = ((0L until 30L).map(i => (i, "s0", 1L)) ++
      Seq((100L, "s0", 1000000L)) ++           // dominant weight in s0
      (0L until 5L).map(i => (200L + i, "s1", 1L)) ++
      Seq((300L, "s1", 0L), (301L, "s1", -3L)) // never sampled
      ).toDF("id", "grp", "w")
    def run() = Curation.weightedSampleK(df, "id", "grp", $"w", k = 10)
      .select("grp", "rk", "id", "n_tickets")
      .as[(String, Int, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    val got = run()
    // without replacement: each id at most once; ranks dense 1..k per group
    val s0 = got.filter(_._1 == "s0"); val s1 = got.filter(_._1 == "s1")
    assert(s0.map(_._3).distinct.size === s0.size)
    assert(s0.map(_._2) === (1 to 10))
    // a group smaller than k returns all its (positive-weight) rows
    assert(s1.map(_._3).sorted === (200L until 205L))
    assert(s1.map(_._2) === (1 to 5))
    // the million-ticket row holds the group minimum with p ≈ 1 − 3e-5 —
    // deterministic for the fixed salt, and a weight-sensitivity check
    assert(s0.head._3 === 100L)
    assert(got === run()) // bit-stable rerun
  }

  test("snapshotDiff: added/removed/changed/same with NULL transitions") {
    val old = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]),
      (4L, Some("d")), (5L, Some("e"))).toDF("id", "v")
    val next = Seq(
      (1L, Some("a")),                 // same
      (2L, None: Option[String]),      // value→NULL must be CHANGED
      (3L, Some("c")),                 // NULL→value must be CHANGED
      (5L, Some("e")),                 // same (4 removed)
      (9L, Some("i"))).toDF("id", "v") // added
    val got = Curation.snapshotDiff(old, next, Seq("id"), Seq("v"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((1L, "same"), (2L, "changed"), (3L, "changed"),
      (4L, "removed"), (5L, "same"), (9L, "added")))
  }

  test("hllDistinct: estimate within the m=256 error envelope; " +
      "duplicates collapse; small sets hit linear counting") {
    import graft.operators.Profiling
    // 5000 distinct values, each seen twice -> duplicates must not inflate
    val big = spark.range(5000).toDF("v")
      .unionAll(spark.range(5000).toDF("v"))
      .withColumn("g", lit("a"))
    val est = Profiling.hllDistinct(big, Seq("g"), "v", p = 8)
      .head().getAs[Long]("n_hll")
    // 3 sigma at m=256: 1.04/sqrt(256) * 3 ~ 20%
    assert(math.abs(est - 5000) < 1000, s"estimate $est too far from 5000")
    // tiny set: deterministic — "0".."49" hit 40 registers (10 collisions),
    // linear counting gives floor(256·ln(256/216)) = 43 (the raw estimator
    // would say 206; the branch fired). Pinned against an independent
    // Python replay of the whole sketch.
    val small = spark.range(50).toDF("v").withColumn("g", lit("a"))
    val estS = Profiling.hllDistinct(small, Seq("g"), "v", p = 8)
      .head().getAs[Long]("n_hll")
    assert(estS === 43L, s"linear-counting estimate $estS, expected 43")
  }
}
