package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.IvfRelational
import graft.sources.Tables
import graft.streaming.{AHashStream, ContainmentStream, IvfStream,
  MediaFpStream, RetrievalStream}

/** Dev tool: measures the incremental family's central 100 TB claim —
  * per-batch append cost is BATCH-sized, independent of how large the
  * standing store has grown. The claim is structural (appendBatch reads
  * only the frozen model + its own batch; it never scans the standing
  * deltas), but r10 makes it a measurement: the same fixed batch is
  * appended against standing stores 10× apart in size (sf0.1 vs the
  * [[Sf1Gen]] sf1), and the per-append wall times must be flat (ratio
  * ≈ 1×, not ≈ 10×).
  *
  * Probed stores: [[IvfStream]] (the data-sized index whose delta is
  * batch-sized — the interesting case), [[RetrievalStream]] (posting
  * deltas — tokenizes only its own docs), and since r14 the media-hash
  * stores [[AHashStream]] / [[MediaFpStream]] (the family whose per-batch
  * cost is DOMINATED by its own codec work — decode scales with the
  * batch, the probe is a broadcast against the standing scan union;
  * VERDICT r13 missing #4 asked for the same number the other stores
  * have). The sketch stores (HLL / count-min / moments / bin counts /
  * bloom bits) append model-sized deltas from a batch-sized scan by
  * construction and would only restate the same number.
  *
  * The r13 containment arm ([[ContainmentStream]], p127) measures a
  * WEAKER claim deliberately: its probe must read the standing set
  * relation to emit cross pairs (unlike IvfStream's model-only append),
  * so per-batch cost is batch work + ONE narrow columnar scan of the
  * 8-bytes-per-element store — the 10× ratio should therefore sit well
  * below 10× (scan increment only, no re-shingle, no standing-sized
  * exchange), not at 1×. Each append lands under FRESH ids (r13's probe
  * replayed identical ids every batch, violating the store's
  * rows-unique-across-deltas contract mid-measurement — ADVICE r13 #2).
  *
  * The r14 PRUNING arm measures the layout lever on that linear term
  * (VERDICT r13 #2): a trickle-sized batch (2 videos, ≤ a dozen distinct
  * frame hashes) probes the same standing store before and after
  * [[ContainmentStream.compactStore]] clusters the base by `g`, with the
  * batch's gram set pushed as a literal IN predicate
  * (`filterBatch(pushGramLimit)`); parquet row-group stats then skip
  * non-matching zones and the standing-scan input bytes must DROP on the
  * clustered base.
  *
  * Usage: runMain graft.tools.StreamCostProbe [sf1Dir] [nAppends]
  */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("target/sf1")
    val nAppends = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      // let the pruning arm's ~dozen-hash IN survive to the parquet
      // filter instead of degrading to a useless min/max range on
      // uniform hash keys (see ContainmentStream.filterBatch scaladoc)
      .config("spark.sql.parquet.pushdown.inFilterThreshold", 64)
      .appName("streamcostprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val bytesRead = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    })

    // The fixed batch: the same 500 sf0.1 vectors / 200 sf0.1 docs at
    // every standing size, so any time difference is the standing store's.
    val batchVecs = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .filter(col("vec_id") < 500).localCheckpoint(true)
    val batchDocs = Tables.documents(spark, "/root/testdata/sf0.1")
      .filter(col("doc_id") < 200).localCheckpoint(true)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def ivfAppends(dir: String, label: String): Seq[Double] = {
      val emb = Tables.embeddings(spark, dir)
      val root = Files.createTempDirectory(s"scp_ivf_$label").toString
      // Same 64-cell bank config at every scale: the bank is the frozen
      // model the batch assigns under; its size must not vary with the
      // standing corpus or the assign cost comparison is confounded.
      val bank = IvfRelational.trainBank(emb, nCells = 64, iters = 1)
        .localCheckpoint(true)
      val standing = timed {
        IvfStream.writeStanding(spark, s"$root/bank", s"$root/idx", emb, bank)
      }
      val times = (0L until nAppends.toLong).map { b =>
        timed {
          IvfStream.appendBatch(spark, s"$root/bank", s"$root/idx",
            s"$root/out", "vec_id", "embedding")(batchVecs, b)
        }
      }
      println(f"IVF   $label%-6s standing=$standing%6.2fs appends=" +
        times.map(t => f"$t%.2f").mkString("[", ", ", "]s"))
      times
    }

    def bm25Appends(dir: String, label: String): Seq[Double] = {
      val docs = Tables.documents(spark, dir)
      val root = Files.createTempDirectory(s"scp_bm_$label").toString
      val standing = timed {
        RetrievalStream.writeStanding(spark, root, docs, "doc_id", "text")
      }
      val times = (0L until nAppends.toLong).map { b =>
        timed {
          RetrievalStream.appendBatch(spark, root, "doc_id", "text")(
            batchDocs, b)
        }
      }
      println(f"BM25  $label%-6s standing=$standing%6.2fs appends=" +
        times.map(t => f"$t%.2f").mkString("[", ", ", "]s"))
      times
    }

    // The fixed media batches: the same 50 sf0.1 videos / clips at every
    // standing size. Ids are offset PER APPEND (base + b·1000) so every
    // delta lands under fresh ids — the store's rows-unique-across-deltas
    // contract holds throughout the measurement (ADVICE r13 #2); ids stay
    // inside the standing id range's hash neighborhoods so probes still
    // exercise the realistic re-upload shape.
    def offsetIds(base: DataFrame, b: Long): DataFrame =
      base.withColumn("media_id", col("media_id") + lit(900000L + b * 1000L))

    val batchVids = {
      import spark.implicits._
      Multimodal.fromDocuments(spark,
          Tables.documents(spark, "/root/testdata/sf0.1"),
          onlyKind = Some("video"))
        .filter(_.media_id < 150).toDF()
        .select(col("media_id"), col("payload")).localCheckpoint(true)
    }
    val batchClips = {
      import spark.implicits._
      Multimodal.fromDocuments(spark,
          Tables.documents(spark, "/root/testdata/sf0.1"),
          onlyKind = Some("audio"), intAudio = true)
        .filter(_.media_id < 150).toDF()
        .select(col("media_id"), col("payload")).localCheckpoint(true)
    }

    def ctAppends(dir: String, label: String): Seq[Double] = {
      val vids = Multimodal.fromDocuments(spark, Tables.documents(spark, dir),
        onlyKind = Some("video")).toDF()
        .select(col("media_id"), col("payload"))
      val root = Files.createTempDirectory(s"scp_ct_$label").toString
      val setsOf = (df: DataFrame) =>
        Multimodal.videoFrameSetBytes(df, "media_id", "payload")
      val standing = timed {
        ContainmentStream.writeStanding(spark, s"$root/idx", vids, setsOf)
      }
      val times = (0L until nAppends.toLong).map { b =>
        timed {
          ContainmentStream.filterBatch(spark, s"$root/idx", s"$root/out",
            setsOf, threshold = 0.9)(offsetIds(batchVids, b), b)
          ()
        }
      }
      println(f"CONT  $label%-6s standing=$standing%6.2fs appends=" +
        times.map(t => f"$t%.2f").mkString("[", ", ", "]s"))
      times
    }

    def ahAppends(dir: String, label: String): Seq[Double] = {
      val clips = Multimodal.fromDocuments(spark, Tables.documents(spark, dir),
        onlyKind = Some("audio"), intAudio = true).toDF()
        .select(col("media_id"), col("payload"))
      val root = Files.createTempDirectory(s"scp_ah_$label").toString
      val standing = timed {
        AHashStream.writeStanding(spark, s"$root/idx", clips,
          hasher = Multimodal.audioAHash64Bytes)
      }
      val times = (0L until nAppends.toLong).map { b =>
        timed {
          AHashStream.filterBatch(spark, s"$root/idx", s"$root/out",
            "media_id", "payload",
            hasher = Multimodal.audioAHash64Bytes)(
            offsetIds(batchClips, b), b)
          ()
        }
      }
      println(f"AHASH $label%-6s standing=$standing%6.2fs appends=" +
        times.map(t => f"$t%.2f").mkString("[", ", ", "]s"))
      times
    }

    def mfAppends(dir: String, label: String): Seq[Double] = {
      val clips = Multimodal.fromDocuments(spark, Tables.documents(spark, dir),
        onlyKind = Some("audio"), intAudio = true).toDF()
        .select(col("media_id"), col("payload"))
      val root = Files.createTempDirectory(s"scp_mf_$label").toString
      val profiler = (df: DataFrame) =>
        Multimodal.audioFpBytes(df, "media_id", "payload")
      val standing = timed {
        MediaFpStream.writeStanding(spark, s"$root/idx", clips, profiler)
      }
      val times = (0L until nAppends.toLong).map { b =>
        timed {
          MediaFpStream.filterBatch(spark, s"$root/idx", s"$root/out",
            profiler)(offsetIds(batchClips, b), b)
          ()
        }
      }
      println(f"MEDFP $label%-6s standing=$standing%6.2fs appends=" +
        times.map(t => f"$t%.2f").mkString("[", ", ", "]s"))
      times
    }

    // ---- pruning arm: clustered compacted base vs plain base ------------
    // One trickle batch (2 videos) probes an sf1-sized standing store;
    // the batch's ≤ ~dozen distinct frame hashes push as a literal IN.
    // Before clustering: the scan reads every row group (uniform hashes,
    // nothing sorted). After compactStore (base sorted by g): row-group
    // zones are tight g ranges and the IN skips the rest.
    def pruneProbe(dir: String): (Long, Long) = {
      import spark.implicits._
      val vids = Multimodal.fromDocuments(spark, Tables.documents(spark, dir),
        onlyKind = Some("video")).toDF()
        .select(col("media_id"), col("payload"))
      val tiny = Multimodal.fromDocuments(spark,
          Tables.documents(spark, "/root/testdata/sf0.1"),
          onlyKind = Some("video"))
        .filter(_.media_id < 6).toDF()
        .select(col("media_id") + 990000L, col("payload"))
        .toDF("media_id", "payload").localCheckpoint(true)
      val root = Files.createTempDirectory("scp_prune").toString
      val setsOf = (df: DataFrame) =>
        Multimodal.videoFrameSetBytes(df, "media_id", "payload")
      ContainmentStream.writeStanding(spark, s"$root/idx", vids, setsOf)
      // one delta so compaction has >= 2 versions to fold
      ContainmentStream.filterBatch(spark, s"$root/idx", s"$root/out",
        setsOf, threshold = 0.9)(offsetIds(batchVids, 90L), 0L)
      def measure(b: Long): Long = {
        // the listener bus is async (and its flush is private[spark]) —
        // a short settle after the action is enough for a dev tool
        Thread.sleep(1500); bytesRead.set(0L)
        ContainmentStream.filterBatch(spark, s"$root/idx", s"$root/out",
          setsOf, threshold = 0.9)(tiny, b)
        Thread.sleep(1500)
        bytesRead.get()
      }
      val plain = measure(1L)
      ContainmentStream.compactStore(spark, s"$root/idx", upTo = 2L)
      val clustered = measure(3L)
      (plain, clustered)
    }

    // BM25 sibling of the pruning arm: the probe's query-vocabulary IN
    // (4 terms, under the default inFilterThreshold) already pushes into
    // every delta's scan — compactStore's term-clustered base turns it
    // into row-group/file pruning at DEFAULT settings.
    def bm25PruneProbe(dir: String): (Long, Long) = {
      val docs = Tables.documents(spark, dir)
      val root = Files.createTempDirectory("scp_bmprune").toString
      RetrievalStream.writeStanding(spark, root, docs, "doc_id", "text")
      RetrievalStream.appendBatch(spark, root, "doc_id", "text")(
        batchDocs, 0L)
      val terms = Seq("data", "merge", "hash", "scan")
      def measure(): Long = {
        Thread.sleep(1500); bytesRead.set(0L)
        RetrievalStream.bm25TopK(spark, root, terms, 40).collect()
        Thread.sleep(1500)
        bytesRead.get()
      }
      val plain = measure()
      RetrievalStream.compactStore(spark, root, upTo = 1L)
      val clustered = measure()
      (plain, clustered)
    }

    // MediaFp sibling of the pruning arm (r14: the fp push + fp-clustered
    // base): a 2-clip batch's fingerprints push as a literal `fp IN`
    // (2 longs — under even the DEFAULT inFilterThreshold) and the
    // standing-scan input bytes must drop once compactStore clusters the
    // base by fp.
    def mfPruneProbe(dir: String): (Long, Long) = {
      import spark.implicits._
      val clips = Multimodal.fromDocuments(spark, Tables.documents(spark, dir),
        onlyKind = Some("audio"), intAudio = true).toDF()
        .select(col("media_id"), col("payload"))
      val tiny = Multimodal.fromDocuments(spark,
          Tables.documents(spark, "/root/testdata/sf0.1"),
          onlyKind = Some("audio"), intAudio = true)
        .filter(_.media_id < 6).toDF()
        .select(col("media_id") + 990000L, col("payload"))
        .toDF("media_id", "payload").localCheckpoint(true)
      val root = Files.createTempDirectory("scp_mfprune").toString
      val profiler = (df: DataFrame) =>
        Multimodal.audioFpBytes(df, "media_id", "payload")
      MediaFpStream.writeStanding(spark, s"$root/idx", clips, profiler)
      // one delta so compaction has >= 2 versions to fold
      MediaFpStream.filterBatch(spark, s"$root/idx", s"$root/out",
        profiler)(offsetIds(batchClips, 90L), 0L)
      def measure(b: Long): Long = {
        Thread.sleep(1500); bytesRead.set(0L)
        MediaFpStream.filterBatch(spark, s"$root/idx", s"$root/out",
          profiler)(tiny, b)
        Thread.sleep(1500)
        bytesRead.get()
      }
      val plain = measure(1L)
      MediaFpStream.compactStore(spark, s"$root/idx", upTo = 2L)
      val clustered = measure(3L)
      (plain, clustered)
    }

    // Near-dup sibling (r14: the bucket push + (band, bucket)-clustered
    // base): a 3-doc batch bands to ≤ 48 distinct buckets (under the
    // configured inFilterThreshold), pushed as a literal `bucket IN`;
    // within each band run of the clustered base, bucket zones are tight
    // and the standing band scan prunes.
    def ndPruneProbe(dir: String): (Long, Long) = {
      import graft.streaming.NearDupStream
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val tiny = Tables.documents(spark, "/root/testdata/sf0.1")
        .filter(col("doc_id") < 3)
        .select((col("doc_id") + 990000L).as("doc_id"), col("text"))
        .localCheckpoint(true)
      val root = Files.createTempDirectory("scp_ndprune").toString
      val idxRoot = s"$root/idx"; val docsRoot = s"$root/docs"
      graft.operators.Dedup.minhashBandIndex(docs, "doc_id", "text")
        .write.parquet(s"$idxRoot/v0")
      docs.write.parquet(s"$docsRoot/v0")
      // one delta so compaction has >= 2 versions to fold
      NearDupStream.filterBatch(spark, idxRoot, docsRoot, s"$root/out",
        "doc_id", "text", threshold = 0.4)(
        batchDocs.withColumn("doc_id", col("doc_id") + 900000L), 0L)
      def measure(b: Long): Long = {
        Thread.sleep(1500); bytesRead.set(0L)
        NearDupStream.filterBatch(spark, idxRoot, docsRoot, s"$root/out",
          "doc_id", "text", threshold = 0.4)(tiny, b)
        Thread.sleep(1500)
        bytesRead.get()
      }
      val plain = measure(1L)
      NearDupStream.compactStores(spark, idxRoot, docsRoot, upTo = 2L)
      val clustered = measure(3L)
      (plain, clustered)
    }

    // ---- takedown arm (r15 — VERDICT r14 wrong #2 / missing #2): the
    // marker fan-in number. maskTombstones re-lists and re-reads every
    // d<N> marker dir on every store read; markers accumulate until a
    // delete-aware compaction consumes them. This arm measures one
    // trickle probe against the SAME standing store under 0 / 8 / 64
    // accumulated markers, then after compactStore consumes them — for
    // one text store (containment) and one media store (media-fp), at
    // 1× and 10× standing. Each tombstone carries 2 distinct standing
    // ids (takedown-sized by contract); probe batches land under fresh
    // ids per append (the rows-unique contract).
    def ctTombArm(dir: String, label: String): Unit = {
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val tiny = Tables.documents(spark, "/root/testdata/sf0.1")
        .filter(col("doc_id") < 3)
        .select((col("doc_id") + 990000L).as("doc_id"), col("text"))
        .localCheckpoint(true)
      val root = Files.createTempDirectory(s"scp_cttomb_$label").toString
      val setsOf = (df: DataFrame) =>
        graft.operators.Dedup.jaccardShingleSets(df, "doc_id", "text")
      ContainmentStream.writeStanding(spark, s"$root/idx", docs, setsOf)
      ContainmentStream.filterBatch(spark, s"$root/idx", s"$root/out",
        setsOf, threshold = 0.6)(
        tiny.withColumn("doc_id", col("doc_id") + 5000L), 0L)
      def probe(b: Long): Double = timed {
        ContainmentStream.filterBatch(spark, s"$root/idx", s"$root/out",
          setsOf, threshold = 0.6)(
          tiny.withColumn("doc_id", col("doc_id") + b * 10L), b)
      }
      val m0 = probe(1L)
      (2L to 9L).foreach(m => graft.streaming.Versions.tombstone(spark,
        s"$root/idx", Seq(m * 2, m * 2 + 1), m))
      val m8 = probe(10L)
      (10L to 65L).foreach(m => graft.streaming.Versions.tombstone(spark,
        s"$root/idx", Seq(m * 2, m * 2 + 1), m))
      val m64 = probe(66L)
      ContainmentStream.compactStore(spark, s"$root/idx", upTo = 66L)
      val after = probe(67L)
      println(f"| CONT takedown $label | trickle probe s | 0 mk $m0%.2f " +
        f"| 8 mk $m8%.2f | 64 mk $m64%.2f | post-compact $after%.2f |")
    }
    def mfTombArm(dir: String, label: String): Unit = {
      val clips = Multimodal.fromDocuments(spark, Tables.documents(spark, dir),
        onlyKind = Some("audio"), intAudio = true).toDF()
        .select(col("media_id"), col("payload"))
      val tiny = {
        import spark.implicits._
        Multimodal.fromDocuments(spark,
            Tables.documents(spark, "/root/testdata/sf0.1"),
            onlyKind = Some("audio"), intAudio = true)
          .filter(_.media_id < 6).toDF()
          .select((col("media_id") + 990000L).as("media_id"),
            col("payload")).localCheckpoint(true)
      }
      val root = Files.createTempDirectory(s"scp_mftomb_$label").toString
      val profiler = (df: DataFrame) =>
        Multimodal.audioFpBytes(df, "media_id", "payload")
      MediaFpStream.writeStanding(spark, s"$root/idx", clips, profiler)
      MediaFpStream.filterBatch(spark, s"$root/idx", s"$root/out",
        profiler)(tiny.withColumn("media_id", col("media_id") + 5000L), 0L)
      def probe(b: Long): Double = timed {
        MediaFpStream.filterBatch(spark, s"$root/idx", s"$root/out",
          profiler)(
          tiny.withColumn("media_id", col("media_id") + b * 10L), b)
      }
      // standing audio ids are the kind stripe (media_id % 3 picks the
      // modality) — tombstone real standing clip ids. Ordered pull so the
      // tombstoned set is reproducible across runs, and sized up front:
      // the slices below consume indices up to (65-2)*2+2 = 128
      // (ADVICE r15 #4 — a bare limit() could come back short AND
      // nondeterministic at a small scale).
      val standingIds = clips.select(col("media_id")).orderBy("media_id")
        .limit(200).collect().map(_.getLong(0)).toSeq
      require(standingIds.size >= 128,
        s"mfTombArm needs >= 128 standing clips at $label, " +
          s"got ${standingIds.size}")
      val m0 = probe(1L)
      (2L to 9L).foreach(m => graft.streaming.Versions.tombstone(spark,
        s"$root/idx", standingIds.slice((m.toInt - 2) * 2,
          (m.toInt - 2) * 2 + 2), m))
      val m8 = probe(10L)
      (10L to 65L).foreach(m => graft.streaming.Versions.tombstone(spark,
        s"$root/idx", standingIds.slice((m.toInt - 2) * 2,
          (m.toInt - 2) * 2 + 2), m))
      val m64 = probe(66L)
      MediaFpStream.compactStore(spark, s"$root/idx", upTo = 66L)
      val after = probe(67L)
      println(f"| MEDFP takedown $label | trickle probe s | 0 mk $m0%.2f " +
        f"| 8 mk $m8%.2f | 64 mk $m64%.2f | post-compact $after%.2f |")
    }

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // ---- cluster-identity arm (r16 — VERDICT r15 next #1): the one
    // incremental store whose cost story had no number. Synthetic standing
    // state (quad clusters via chained pairs + one planted 10⁴-member
    // hub-spoke mega-cluster) at 1× and 10×; the SAME fixed batch folds
    // against both, then three retract shapes: component-local (2 quad
    // clusters), the mega-cluster relabel (touch its label with a smaller
    // batch id — the whole 10⁴-row cluster rewrites + re-elects), and the
    // mega-cluster takedown (delete the hub — 10⁴ spokes resolve to
    // singletons). electCanon's agg shape keeps the mega rows partial-
    // aggregated map-side (the skew fix this arm gates by measurement).
    def csArm(nStanding: Long, label: String): Unit = {
      import graft.streaming.ClusterStream
      val root = Files.createTempDirectory(s"scp_cs_$label").toString
      val mega = 900000000L
      def scoreOf(c: org.apache.spark.sql.Column) =
        (pmod(xxhash64(c), lit(1000L)) / 1000.0)
      val docs = spark.range(nStanding)
        .select(col("id"), scoreOf(col("id")).as("score"))
        .unionAll(spark.range(10000)
          .select((col("id") + mega).as("id"),
            scoreOf(col("id") + mega).as("score")))
      val pairs = spark.range(nStanding)
        .filter(pmod(col("id"), lit(4L)) =!= 3L)
        .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
        .unionAll(spark.range(1, 10000)
          .select(lit(mega).as("id_a"), (col("id") + mega).as("id_b")))
      val standing = timed {
        ClusterStream.writeStanding(spark, root, docs, pairs)
      }
      // the fixed batch: 2000 fresh docs, 1000 pairing with standing ids
      // spread across distinct quad clusters — identical at every scale
      val fresh = 950000000L
      val bDocs = spark.range(2000)
        .select((col("id") + fresh).as("id"),
          scoreOf(col("id") + fresh).as("score")).localCheckpoint(true)
      val bPairs = spark.range(1000)
        .select((col("id") * 4L).as("id_a"),
          (col("id") + fresh).as("id_b")).localCheckpoint(true)
      val folds = (0L until nAppends.toLong).map { b =>
        timed {
          ClusterStream.foldBatch(spark, root)(
            bDocs.withColumn("id", col("id") + b * 10000L),
            bPairs.withColumn("id_b", col("id_b") + b * 10000L), b)
        }
      }
      val nextB = nAppends.toLong
      // component-local retract: 2 docs from distinct quad clusters
      // (ids untouched by the folds, which pair only with id_a <= 3996)
      val tSmall = timed {
        ClusterStream.retract(spark, root,
          spark.range(2).select((col("id") * 8L + 500001L).as("id")),
          nextB)
      }
      // mega relabel: a fresh id SMALLER than the mega label pairs into
      // the cluster — min-id labeling rewrites all 10⁴ member rows
      val tRelabel = timed {
        ClusterStream.foldBatch(spark, root)(
          spark.range(1).select((col("id") + 899999999L).as("id"),
            scoreOf(col("id")).as("score")),
          spark.range(1).select(lit(899999999L).as("id_a"),
            (lit(mega) + 5L).as("id_b")), nextB + 1L)
      }
      // mega takedown: delete the (new) label + hub — every spoke
      // resolves to a singleton, 10⁴ assignment rows + elections rewrite
      val tMega = timed {
        ClusterStream.retract(spark, root,
          spark.range(899999999L, mega + 1L).select(col("id")),
          nextB + 2L)
      }
      println(f"| CLUSTER $label | standing $standing%.2f s | fold med " +
        f"${med(folds)}%.2f s | retract(2-doc) $tSmall%.2f s | mega " +
        f"relabel $tRelabel%.2f s | mega takedown $tMega%.2f s |")
    }

    // ---- production-loop arm (r17 — VERDICT r16 next #3): the p145
    // composition measured PER PHASE against 1× and 10× standing stores —
    // probe (banded near-dup filterBatch), fold (ClusterStream), verdict
    // (duplicate-of-canonical join), and one journaled cross-store
    // takedown fan-out — plus the read-path tax the loop accrues when it
    // never compacts: a 20-trigger run whose first/last per-phase costs
    // expose the version fan-in growth (every trigger adds one delta to
    // the band index, the docs store, and the three cluster roots; reads
    // list + union them all). Batches land under fresh ids per trigger
    // (the rows-unique contract); scores are a hash stripe — the probe
    // measures plan cost, not quality semantics.
    def loopArm(dir: String, label: String, triggers: Int): Unit = {
      import graft.streaming.{ClusterStream, NearDupStream, Takedown}
      import graft.streaming.Takedown.Target
      import graft.operators.Dedup
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      val root = Files.createTempDirectory(s"scp_loop_$label").toString
      val ndIdx = s"$root/ndidx"; val ndDocs = s"$root/nddocs"
      val csRoot = s"$root/cs"
      def scored(df: DataFrame): DataFrame = df
        .select(col("doc_id").as("id"),
          (pmod(xxhash64(col("doc_id")), lit(1000L)) / 1000.0).as("score"))
      val standing = timed {
        Dedup.minhashBandIndex(docs, "doc_id", "text")
          .write.parquet(s"$ndIdx/v0")
        docs.write.parquet(s"$ndDocs/v0")
        ClusterStream.writeStanding(spark, csRoot, scored(docs),
          Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.4))
      }
      val probes = scala.collection.mutable.ArrayBuffer.empty[Double]
      val folds = scala.collection.mutable.ArrayBuffer.empty[Double]
      val verdicts = scala.collection.mutable.ArrayBuffer.empty[Double]
      (0 until triggers).foreach { t =>
        val b = batchDocs.withColumn("doc_id",
            col("doc_id") + lit(910000000L + t * 10000L))
          .localCheckpoint(true)
        val bi = t.toLong
        var pairs: DataFrame = null
        probes += timed {
          pairs = NearDupStream.filterBatch(spark, ndIdx, ndDocs,
            s"$root/ndout", "doc_id", "text", threshold = 0.4,
            materializePairs = true)(b, bi)
        }
        folds += timed {
          ClusterStream.foldBatch(spark, csRoot)(scored(b),
            pairs.select(col("id_a"), col("id_b")), bi)
        }
        verdicts += timed {
          ClusterStream.readAssignments(spark, csRoot, upTo = bi + 1)
            .join(broadcast(b.select(col("doc_id").as("id"))), Seq("id"),
              "left_semi")
            .join(ClusterStream.readCanonicals(spark, csRoot, upTo = bi + 1)
              .select(col("cid"), col("keep_id")), Seq("cid"))
            .count()
          ()
        }
      }
      // one journaled cross-store takedown under the next batch id: the
      // sweep resolution + three-store marker fan-out + component repair
      val sweepIds = docs.select(col("doc_id")).orderBy("doc_id").limit(4)
      val tj = timed {
        Takedown.takedownAll(spark, s"$root/journal", sweepIds,
          triggers.toLong, Seq(
            Target("band index", ndIdx),
            Target("docs store", ndDocs),
            Target("cluster store",
              (s: SparkSession, ids: DataFrame, bi: Long) =>
                ClusterStream.retract(s, csRoot, ids, bi))))
        ()
      }
      println(f"| LOOP $label | standing $standing%.2f s | probe med " +
        f"${med(probes.toSeq)}%.2f s | fold med ${med(folds.toSeq)}%.2f s " +
        f"| verdict med ${med(verdicts.toSeq)}%.2f s | journal fan-out " +
        f"$tj%.2f s | trigger1 " +
        f"${probes.head + folds.head + verdicts.head}%.2f s → trigger$triggers " +
        f"${probes.last + folds.last + verdicts.last}%.2f s |")
    }

    val only = if (args.length > 2) Some(args(2)) else None
    if (only.contains("cluster")) {
      csArm(1000000L, "1e6")
      csArm(10000000L, "1e7")
      spark.stop(); return
    }
    if (only.contains("loop")) {
      loopArm("/root/testdata/sf0.1", "sf0.1", nAppends)
      loopArm(sf1, "sf1", nAppends)
      loopArm("/root/testdata/sf0.1", "sf0.1-x20", 20)
      spark.stop(); return
    }

    val i01 = ivfAppends("/root/testdata/sf0.1", "sf0.1")
    val i1 = ivfAppends(sf1, "sf1")
    val b01 = bm25Appends("/root/testdata/sf0.1", "sf0.1")
    val b1 = bm25Appends(sf1, "sf1")
    val c01 = ctAppends("/root/testdata/sf0.1", "sf0.1")
    val c1 = ctAppends(sf1, "sf1")
    val a01 = ahAppends("/root/testdata/sf0.1", "sf0.1")
    val a1 = ahAppends(sf1, "sf1")
    val m01 = mfAppends("/root/testdata/sf0.1", "sf0.1")
    val m1 = mfAppends(sf1, "sf1")
    ctTombArm("/root/testdata/sf0.1", "sf0.1")
    ctTombArm(sf1, "sf1")
    mfTombArm("/root/testdata/sf0.1", "sf0.1")
    mfTombArm(sf1, "sf1")
    val (plainBytes, clusteredBytes) = pruneProbe(sf1)
    val (bmPlain, bmClustered) = bm25PruneProbe(sf1)
    val (mfPlain, mfClustered) = mfPruneProbe(sf1)
    val (ndPlain, ndClustered) = ndPruneProbe(sf1)

    println("| store | batch | sf0.1 append s | sf1 append s | ratio |")
    println("|---|---|---|---|---|")
    println(f"| IvfStream | 500 vecs | ${med(i01)}%.2f | ${med(i1)}%.2f " +
      f"| ${med(i1) / med(i01)}%.2f× |")
    println(f"| RetrievalStream | 200 docs | ${med(b01)}%.2f | ${med(b1)}%.2f " +
      f"| ${med(b1) / med(b01)}%.2f× |")
    println(f"| ContainmentStream | 50 videos | ${med(c01)}%.2f " +
      f"| ${med(c1)}%.2f | ${med(c1) / med(c01)}%.2f× " +
      "(narrow-scan increment expected — the probe reads the standing " +
      "set relation; the claim is no re-shingle/no standing exchange, " +
      "not flatness) |")
    println(f"| AHashStream | 50 clips | ${med(a01)}%.2f | ${med(a1)}%.2f " +
      f"| ${med(a1) / med(a01)}%.2f× (decode dominates — batch-sized) |")
    println(f"| MediaFpStream | 50 clips | ${med(m01)}%.2f | ${med(m1)}%.2f " +
      f"| ${med(m1) / med(m01)}%.2f× (decode dominates — batch-sized) |")
    println(f"| prune (2-video probe, sf1 store) | input bytes | " +
      f"plain ${plainBytes / 1048576.0}%.1f MiB | clustered " +
      f"${clusteredBytes / 1048576.0}%.1f MiB | " +
      f"${plainBytes.toDouble / math.max(1L, clusteredBytes)}%.1f× less |")
    println(f"| prune (bm25 4-term probe, sf1 store) | input bytes | " +
      f"plain ${bmPlain / 1048576.0}%.1f MiB | clustered " +
      f"${bmClustered / 1048576.0}%.1f MiB | " +
      f"${bmPlain.toDouble / math.max(1L, bmClustered)}%.1f× less |")
    println(f"| prune (2-clip fp probe, sf1 store) | input bytes | " +
      f"plain ${mfPlain / 1048576.0}%.1f MiB | clustered " +
      f"${mfClustered / 1048576.0}%.1f MiB | " +
      f"${mfPlain.toDouble / math.max(1L, mfClustered)}%.1f× less |")
    println(f"| prune (3-doc bucket probe, sf1 store) | input bytes | " +
      f"plain ${ndPlain / 1048576.0}%.1f MiB | clustered " +
      f"${ndClustered / 1048576.0}%.1f MiB | " +
      f"${ndPlain.toDouble / math.max(1L, ndClustered)}%.1f× less |")
    spark.stop()
  }
}
