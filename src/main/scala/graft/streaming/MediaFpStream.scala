package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming EXACT-fingerprint media index — the audio/video members of
  * the incremental family, completing the per-modality matrix
  * ([[NearDupStream]] text, [[IvfStream]] embeddings, [[AHashStream]]
  * images, this for audio clips p122 and video containers p123): each
  * media micro-batch decodes and fingerprints ONLY its own payloads (the
  * codec work is paid once, at ingest — the `profiler` is the family's
  * scan-shaped integer fold: [[graft.multimodal.Multimodal.audioProfile]]
  * or the p118 frame-profile fold), emits its EXACT-duplicate pairs —
  * in-batch via a fingerprint self-group, cross via a broadcast probe of
  * the batch's fingerprints against the standing index's plain scan
  * union — and appends its own 16-byte (media_id, fp) delta for later
  * batches to probe.
  *
  * Where [[AHashStream]] bands Hamming-close perceptual hashes, this
  * store matches exact content fingerprints — the right primitive for
  * the re-ingest/re-crawl dedup a media lake runs at ingest (byte-
  * identical payloads re-arriving under new ids), and exactly what the
  * codec-loop oracles let DuckDB replay (p119's integer-PCM chain,
  * p118's frame-hash chain): the emitted pairs are a pure function of
  * the fingerprint relation.
  *
  * Store: `root/v*` — (media_id, fp) deltas (`v0` = standing). 16 bytes
  * per clip/video at ANY payload size; payloads never enter the store
  * and never shuffle (the probe joins fingerprints only). Exactly-once
  * contract is the family's: batch-id-named deltas, deterministic
  * overwrite on redelivery, lineage-fork guard. */
object MediaFpStream {

  /** Fingerprint the standing corpus and write `root/v0`
    * (live-root-guarded). `profiler` maps a (idCol, payload...) frame to
    * (media_id, fp) — decode + fold, scan-shaped. */
  def writeStanding(spark: SparkSession, root: String, standing: DataFrame,
      profiler: DataFrame => DataFrame): Unit = {
    Versions.guardStandingWrite(spark, root)
    // store columns normalized to (media_id, fp) regardless of the
    // profiler's fingerprint column name — appendBatch joins on `fp`
    profiler(standing).toDF("media_id", "fp")
      .write.mode("overwrite").parquet(s"$root/v0")
  }

  /** The assembled fingerprint index: every delta `<= upTo`, a plain
    * scan union (rows unique across deltas — each item arrives in
    * exactly one batch). */
  def readIndex(spark: SparkSession, root: String,
      upTo: Long = Long.MaxValue): DataFrame = {
    val versions = Versions.list(spark, root).filter(_._1 <= upTo)
    require(versions.nonEmpty, s"no index versions at $root")
    spark.read.parquet(versions.map(_._2.toString): _*)
  }

  /** The `foreachBatch` callback: fingerprint batch `batchId`'s media,
    * emit its exact-dup pairs (in-batch + against everything earlier) to
    * `outRoot/b<batchId>`, and append the batch's fingerprint delta as
    * `root/v{batchId+1}`. */
  def appendBatch(spark: SparkSession, root: String, outRoot: String,
      profiler: DataFrame => DataFrame,
      autoCompactVersions: Option[Int] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    val versions = Versions.list(spark, root)
    require(versions.exists(_._1 == 0L),
      s"standing fingerprint index $root/v0 missing — writeStanding " +
        "before starting the stream")
    versions.lastOption.foreach { case (newest, _) =>
      require(newest <= batchId + 1,
        s"fingerprint index at $root is at v$newest but the stream is " +
          s"replaying batch $batchId — restarting with a fresh checkpoint " +
          "over existing deltas would fork their lineage; resume from the " +
          "original checkpoint or start new roots")
    }
    autoCompactVersions.foreach(k =>
      Versions.autoCompact(spark, root, batchId, k))
    val bf = profiler(batch).toDF("media_id", "fp").localCheckpoint(true)
    // in-batch: exact-fp self-group; groups are duplicate classes (tiny
    // by construction — identical payloads), pairs enumerate in-group
    val members = col("__m")
    val inBatch = bf
      .groupBy(col("fp"))
      .agg(collect_list(col("media_id")).as("__m"))
      .filter(size(members) >= 2)
      .select(explode(flatten(transform(sort_array(members), (x, i) =>
        transform(slice(sort_array(members), i + 2,
          size(members)), y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
    // cross arm: the standing index stays a narrow scan union; the
    // batch's fingerprints BROADCAST into the join — the standing index
    // never crosses a shuffle
    val cross = readIndex(spark, root, upTo = batchId)
      .join(broadcast(bf.select(col("media_id").as("new_id"),
        col("fp"))), Seq("fp"))
      .select(least(col("media_id"), col("new_id")).as("id_a"),
        greatest(col("media_id"), col("new_id")).as("id_b"))
    inBatch.unionAll(cross)
      .dropDuplicates("id_a", "id_b")
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite").parquet(s"$outRoot/b$batchId")
    bf.write.mode("overwrite").parquet(s"$root/v${batchId + 1}")
  }

  /** Fold deltas `v0..v<upTo>` into a new base (rows unique across
    * deltas ⇒ the identity fold is read-equivalent). */
  def compactStore(spark: SparkSession, root: String, upTo: Long): Unit =
    Versions.compact(spark, root, upTo)
}
