package graft

import graft.operators.Curation
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Regressions for the round-1 advice findings: hashSplit overflow at large
  * ids, float split-boundary drift, null elements in token_shingles, and
  * out-of-order events regressing sessionization state. */
class AdviceRegressionSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: ids beyond 2^32 neither overflow nor diverge from the reduced arithmetic") {
    // 9e18 * 2654435761 would wrap a signed 64-bit; the reduced form must not.
    val ids = Seq(0L, 1L, 3470000000L, 9000000000000000000L, Long.MaxValue)
    val got = Curation.hashSplit(ids.toDF("id"), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    val p = 1000000007L
    ids.foreach { id =>
      val bucket = (((id % p) * 2654435761L) % p) % 1000
      val want = if (bucket < 800) "train" else if (bucket < 900) "val" else "test"
      assert(got(id) === want, s"id=$id bucket=$bucket")
    }
  }

  test("hashSplit: negative ids agree with the sign-safe oracle arithmetic") {
    // Spark's pmod is always non-negative; the oracle SQL mirrors it with
    // ((id % p) + p) % p. Both sides of that equivalence are pinned here.
    val ids = Seq(-1L, -1000000007L, -3470000000L, Long.MinValue + 1)
    val got = Curation.hashSplit(ids.toDF("id"), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("id", "split").as[(Long, String)].collect().toMap
    val p = 1000000007L
    ids.foreach { id =>
      val bucket = ((((id % p) + p) % p * 2654435761L) % p) % 1000
      val want = if (bucket < 800) "train" else if (bucket < 900) "val" else "test"
      assert(bucket >= 0)
      assert(got(id) === want, s"id=$id bucket=$bucket")
    }
  }

  test("hourlyTypeCounts decimal staging keeps values >= 1e8 in the sum") {
    // DECIMAL(12,4) would NULL a 2.5e8 value under non-ANSI casts and drop
    // it silently from total_value; the widened (20,4) stage must not
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val events = Seq(
      (1L, ts, 1L, "big", 2.5e8, "{}"),
      (2L, ts, 2L, "big", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = EventStream.hourlyTypeCounts(events)
      .select("total_value").as[Double].head()
    assert(got === 2.5e8 + 1.5, s"out-of-DECIMAL(12,4)-domain value lost: $got")
  }

  test("hashSplit: 0.7/0.15/0.15 boundary bucket 850 lands in the later split") {
    // cumulative 0.7+0.15 = 0.8500000000000001 in doubles; the integer cut is
    // 850, so a bucket of exactly 850 belongs to the LAST split, not 'val'.
    val p = 1000000007L
    def bucket(id: Long): Long = (((id % p) * 2654435761L) % p) % 1000
    val boundaryId = (0L to 200000L).find(bucket(_) == 850L).get
    val got = Curation.hashSplit(Seq(boundaryId).toDF("id"), "id",
        Seq("a" -> 0.7, "b" -> 0.15, "c" -> 0.15))
      .select("split").as[String].head()
    assert(got === "c", s"bucket-850 id $boundaryId assigned to $got")
  }

  test("ivfTopK refuses a corpusIndex without its centroid bank") {
    // r4 advice: probing a persisted index under a RECOMPUTED centroid bank
    // silently collapses recall — the operator must demand the bank
    val corpus = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Similarity.ivfTopK(corpus, corpus, k = 1,
        corpusIndex = Some(corpus.withColumn("cell", lit(0))))
    }
    assert(e.getMessage.contains("centroid bank"))
  }

  test("token_shingles skips null elements like simhash/minhash") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT token_shingles(array('a', CAST(NULL AS STRING), 'b', 'c'), 2)")
      .as[Seq[String]].head()
    assert(got === Seq("a b", "b c"))
    val short = spark.sql(
      "SELECT token_shingles(array(CAST(NULL AS STRING), 'x'), 2)")
      .as[Seq[String]].head()
    assert(short === Seq("x")) // one non-null token -> short-doc fallback
  }

  test("sessionize: an out-of-order event in a later micro-batch does not regress the session frontier") {
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)] // (user_id, us)
    val events = mem.toDF().toDF("user_id", "us")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
    val q = EventStream.sessionize(events, gapMinutes = 30).toDF()
      .writeStream.outputMode("append").format("memory")
      .queryName("ooo_sessions").start()
    def us(sec: Long) = sec * 1000000L
    try {
      mem.addData((1L, us(0)), (1L, us(1700)))
      q.processAllAvailable()
      // 100s is BEHIND the frontier (1700s); 3400s is 1700s after the true
      // frontier — within the 1800s gap, so still the same session. The old
      // code reset lastUs to 100s and wrongly split at 3400s.
      mem.addData((1L, us(100)), (1L, us(3400)))
      q.processAllAvailable()
      mem.addData((1L, us(10000))) // far gap: closes the open session
      q.processAllAvailable()
      val sessions = spark.table("ooo_sessions")
        .select("session_id", "n_events").as[(Long, Long)].collect().toSet
      assert(sessions === Set((1L, 4L)),
        s"expected one 4-event session, got $sessions")
    } finally q.stop()
  }

  test("containmentIncremental: a batch doc whose id already exists in the " +
      "corpus emits no self-pair and no duplicate directed pairs") {
    // Redelivered/re-crawled doc: id 1 is in BOTH the corpus index and the
    // batch, with identical text. Without the cross-arm id_a =!= id_b guard
    // this emitted (1, 1, 1.0).
    val corpus = Seq(
      (1L, "alpha beta gamma delta eps zeta eta theta"),
      (2L, "iota kappa lambda mu nu xi omicron pi")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "alpha beta gamma delta eps zeta eta theta"),
      (3L, "alpha beta gamma delta eps")).toDF("doc_id", "text")
    val index = graft.operators.Dedup.containmentOrderedAll(
      graft.operators.Dedup.jaccardShingleSets(corpus, "doc_id", "text"))
    val pairs = graft.operators.Dedup
      .containmentIncremental(batch, index, "doc_id", "text", 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(!pairs.contains((1L, 1L)), s"self-pair emitted: $pairs")
    assert(pairs.size === pairs.distinct.size,
      s"duplicate directed pairs emitted: $pairs")
    // the redelivered doc still matches its corpus twin's neighbors: 3 ⊆ 1
    assert(pairs.contains((3L, 1L)), s"expected (3, 1) in $pairs")
  }

  test("streaming k-means refuses ragged batch vectors before any state write") {
    import java.nio.file.Files
    import graft.streaming.KMeansStream
    val root = Files.createTempDirectory("kmragged_").toString
    val (state, out) = (s"$root/state", s"$root/out")
    KMeansStream.writeSeedState(spark, state,
      Array(Array(0.0, 0.0), Array(10.0, 10.0)))
    // longer than the seeded dim: pos 2 has no seeded (cell, pos) key
    val eLong = intercept[Exception] {
      KMeansStream.advanceBatch(spark, state, out, "id", "v")(
        Seq((1L, Array(1.0, 1.0, 1.0))).toDF("id", "v"), 0L)
    }
    assert(eLong.getMessage.contains("dimensionality"), eLong.getMessage)
    // shorter: would silently skew the running mean without the guard
    val eShort = intercept[Exception] {
      KMeansStream.advanceBatch(spark, state, out, "id", "v")(
        Seq((1L, Array(1.0)), (2L, Array(1.0, 1.0))).toDF("id", "v"), 0L)
    }
    assert(eShort.getMessage.contains("ragged"), eShort.getMessage)
    // neither failed batch may have written a state delta or output
    val deltas = new java.io.File(state).listFiles()
      .map(_.getName).filter(_.matches("v\\d+")).sorted.toSeq
    assert(deltas === Seq("v0"), s"failed batches wrote state: $deltas")
    assert(!new java.io.File(s"$out/b0").exists(),
      "failed batch wrote output")
    // a clean batch still advances normally after the failures
    KMeansStream.advanceBatch(spark, state, out, "id", "v")(
      Seq((1L, Array(1.0, 1.0))).toDF("id", "v"), 0L)
    assert(new java.io.File(s"$state/v1").exists())
  }

  test("bloomFillAt materializes zero-fill hash rows: an empty store reads " +
      "as k rows of fill 0 / fp 0, not an empty frame") {
    import java.nio.file.Files
    import graft.streaming.SketchStream
    val root = Files.createTempDirectory("bloomfill0_").toString
    SketchStream.writeStandingBloom(spark, root,
      Seq.empty[String].toDF("gram"), "gram", k = 4, m = 256)
    val rows = SketchStream.bloomFillAt(spark, root, k = 4, m = 256)
      .select("j", "fill", "fp_rate").as[(Int, Double, Double)]
      .collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0, 1, 2, 3),
      s"every hash row must be present: ${rows.toSeq}")
    assert(rows.forall(r => r._2 === 0.0 && r._3 === 0.0),
      s"empty store must read fill 0 / fp 0: ${rows.toSeq}")
  }

  test("writeStandingBloom refuses a root still holding deltas (mixed-" +
      "parameter fold guard); a v0-only re-run stays allowed") {
    import java.nio.file.Files
    import graft.streaming.SketchStream
    val root = Files.createTempDirectory("bloomlive_").toString
    val grams = (0 until 50).map(i => s"g$i").toDF("gram")
    SketchStream.writeStandingBloom(spark, root, grams, "gram", k = 4, m = 256)
    // exact re-run over v0 alone: allowed (deterministic overwrite)
    SketchStream.writeStandingBloom(spark, root, grams, "gram", k = 4, m = 256)
    SketchStream.advanceBatchBloom(spark, root, "gram", k = 4, m = 256)(
      (50 until 60).map(i => s"g$i").toDF("gram"), 0L)
    // root now holds v0 + v1: a fresh standing write under DIFFERENT
    // parameters would leave v1's 256-bit positions folding under m=512
    val e = intercept[IllegalArgumentException] {
      SketchStream.writeStandingBloom(spark, root, grams, "gram",
        k = 4, m = 512)
    }
    assert(e.getMessage.contains("standing write"), e.getMessage)
  }

  test("standing-write live-root guard is family-wide: every store's " +
      "writeStanding refuses a root holding deltas") {
    import java.nio.file.Files
    import graft.streaming.{AHashStream, PcaStream, Versions}
    val emb = sources.Tables.embeddings(spark, sfDir)
    // PCA moments store
    val pcaRoot = Files.createTempDirectory("pcaguard_").toString + "/m"
    PcaStream.writeStanding(spark, pcaRoot, emb.filter(col("vec_id") < 50))
    PcaStream.advanceBatch(spark, pcaRoot)(
      emb.filter(col("vec_id") >= 50 && col("vec_id") < 80), 0L)
    val ePca = intercept[IllegalArgumentException] {
      PcaStream.writeStanding(spark, pcaRoot, emb.filter(col("vec_id") < 50))
    }
    assert(ePca.getMessage.contains("standing write"), ePca.getMessage)
    // image-hash store
    import graft.multimodal.Multimodal
    val images = Multimodal.fromDocuments(spark,
        sources.Tables.documents(spark, sfDir), onlyKind = Some("image"))
      .filter(_.media_id < 60).toDF()
      .select(col("media_id"), col("payload")).localCheckpoint(true)
    val ahRoot = Files.createTempDirectory("ahguard_").toString + "/idx"
    AHashStream.writeStanding(spark, ahRoot, images)
    // simulate a live delta directly — the guard reads the version layout
    spark.read.parquet(s"$ahRoot/v0").write.parquet(s"$ahRoot/v1")
    val eAh = intercept[IllegalArgumentException] {
      AHashStream.writeStanding(spark, ahRoot, images)
    }
    assert(eAh.getMessage.contains("standing write"), eAh.getMessage)
    // the shared guard itself: fresh and v0-only roots pass
    Versions.guardStandingWrite(spark,
      Files.createTempDirectory("fresh_").toString + "/nothing")
    Versions.guardStandingWrite(spark, pcaRoot.stripSuffix("/m") + "/m2")
  }

  test("bloomBits/bloomMasks agree that m below 64 is out of contract") {
    // a power of two in {2..32} used to pass bloomBits' check and then
    // allocate ZERO mask words (m/64 = 0) in bloomMasks -> AIOOBE
    val grams = Seq("a", "b").toDF("gram")
    val eBits = intercept[IllegalArgumentException] {
      graft.operators.Profiling.bloomBits(grams, "gram", k = 2, m = 32)
    }
    assert(eBits.getMessage.contains("64"), eBits.getMessage)
    val bits = graft.operators.Profiling.bloomBits(grams, "gram", k = 2, m = 64)
    val eMasks = intercept[IllegalArgumentException] {
      graft.operators.Profiling.bloomMasks(bits, k = 2, m = 32)
    }
    assert(eMasks.getMessage.contains("64"), eMasks.getMessage)
    assert(graft.operators.Profiling.bloomMasks(bits, 2, 64)
      .forall(_.length === 1))
  }

  test("intervalOverlap raises on times outside [0, 2^53) instead of " +
      "silently mis-binning") {
    val l = Seq((1L, 0L, 10L)).toDF("k", "ls", "le")
    val r = Seq((1L, 5L, 15L)).toDF("k", "rs", "re")
    // the valid domain still joins exactly
    val ok = graft.operators.Joins.intervalOverlap(
      l, r, Seq("k"), "ls", "le", "rs", "re", binWidth = 4L).count()
    assert(ok === 1L)
    val lNeg = Seq((1L, -8L, 10L)).toDF("k", "ls", "le")
    val eNeg = intercept[Exception] {
      graft.operators.Joins.intervalOverlap(
        lNeg, r, Seq("k"), "ls", "le", "rs", "re", binWidth = 4L).count()
    }
    assert(eNeg.getMessage.contains("2^53"),
      s"negative time must raise: ${eNeg.getMessage}")
    val big = 1L << 53
    val lBig = Seq((1L, big, big + 10L)).toDF("k", "ls", "le")
    val eBig = intercept[Exception] {
      graft.operators.Joins.intervalOverlap(
        lBig, r, Seq("k"), "ls", "le", "rs", "re", binWidth = 4L).count()
    }
    assert(eBig.getMessage.contains("2^53"),
      s"time >= 2^53 must raise: ${eBig.getMessage}")
  }

  test("hammingPairs64 uncapped: a degenerate equal-hash class (all-zero " +
      "hashes) emits its complete pair set without banding blowup, and " +
      "mixed sets match brute force (r12 advice)") {
    import graft.operators.Dedup
    // 40 items hashing to 0 (uniform/black media), plus a near cluster
    // and a far outlier — the degenerate class collides on ALL 28 bands
    val rows =
      (0L until 40L).map(i => (i, 0L)) ++
      Seq((100L, 3L), (101L, 7L), (102L, 0xff00ff00ff00ff0L))
    val hashed = rows.toDF("id", "sh64")
    val got = Dedup.hammingPairs64(hashed, maxHamming = 6,
        maxBucketSize = Int.MaxValue)
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    // brute force over the same relation
    val want = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield (ia, ib, d)).toSet
    // 780 in-class (hamming 0) + 40 class↔3 + 40 class↔7 + (3,7)
    assert(want.size === 40 * 39 / 2 + 40 + 40 + 1, s"fixture: ${want.size}")
    assert(got === want)
    // and each pair appears exactly once (the canonical hash-pair dedup)
    val all = Dedup.hammingPairs64(hashed, maxHamming = 6,
        maxBucketSize = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(all.length === all.toSet.size, "duplicate pairs emitted")
  }

  test("plantAudioVariants fails loud when a wobble would wrap PCM16 " +
      "instead of silently diverging from the oracle (r12 advice)") {
    import graft.multimodal.{MediaCodec, Multimodal}
    import Multimodal.{MediaMeta, MediaRecord}
    // a clip at the PCM16 ceiling: 32000 + 1024 wraps a Short
    val n = 400
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      pcm(2 * i) = (32000 & 0xff).toByte
      pcm(2 * i + 1) = ((32000 >> 8) & 0xff).toByte
      i += 1
    }
    val meta = MediaMeta(0, 0, 8000, 50L)
    val hot = Seq(MediaRecord(1L, "audio",
      MediaCodec.wrapWavPcm(pcm, 8000, n), meta)).toDS()
    val e = intercept[Exception] {
      Multimodal.plantAudioVariants(hot).collect()
    }
    assert(e.getMessage.contains("headroom"), e.getMessage)
    // the in-contract fixture still plants fine
    val ok = Seq(MediaRecord(2L, "audio",
      MediaCodec.syntheticWavInt(2L, 8000, 52L), meta)).toDS()
    assert(Multimodal.plantAudioVariants(ok).collect().length === 1)
  }

  test("IvfStream.checkBank names the pre-r12 pin format instead of a " +
      "misleading bank mismatch (r12 advice)") {
    import graft.streaming.IvfStream
    import graft.operators.IvfRelational
    val root = java.nio.file.Files.createTempDirectory("oldpin_").toString
    val emb = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => (i * 8 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val bank = IvfRelational.trainBank(emb, nCells = 2, iters = 1,
      stride = 10)
    IvfStream.writeStanding(spark, s"$root/bank", s"$root/idx", emb, bank)
    // regress the pin to the old single-row bank_fp-only format
    val fp = spark.read.parquet(s"$root/idx/_params")
      .filter(col("k") === "bank_fp").select("k", "v")
    val old = fp.collect().toSeq
    spark.createDataFrame(
        spark.sparkContext.parallelize(old, 1),
        spark.read.parquet(s"$root/idx/_params").schema)
      .write.mode("overwrite").parquet(s"$root/idx/_params")
    val e = intercept[Exception] {
      IvfStream.checkBank(spark, s"$root/bank", s"$root/idx")
    }
    assert(e.getMessage.contains("predates count pinning"), e.getMessage)
    assert(!e.getMessage.contains("does not match"), e.getMessage)
  }
}
