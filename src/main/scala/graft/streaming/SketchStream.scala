package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Profiling

/** Streaming sketch maintenance — the PROFILING member of the incremental
  * family: each micro-batch appends its [[Profiling.hllRegisters]]
  * relation as a versioned delta (model-sized: ≤ groups·2^p rows
  * regardless of batch or corpus size), and the live cardinality
  * estimate at any point is [[Profiling.hllFromRegisters]] over the
  * register fold — `max(__M)` per (group, idx).
  *
  * The fold is associative AND idempotent — strictly stronger than
  * [[PcaStream]]'s decimal sums ([[RetrievalStream]]'s integer sums):
  * even a DUPLICATED register delta cannot corrupt the estimate, so the
  * store tolerates at-least-once delivery structurally; the family's
  * exactly-once conventions (batch-id-named deltas, deterministic
  * overwrite, lineage guard) are kept anyway for uniformity and for
  * version-count hygiene. Folded == one-shot is exact: the register
  * relation of a union IS the (group, idx)-wise max of per-part
  * relations, so the streamed estimate equals [[Profiling.hllDistinct]]
  * over the assembled corpus bit-for-bit — which is what the p109 oracle
  * replays register-by-register.
  *
  * At 100 TB: per-batch cost is one batch-sized hash+partial-max scan +
  * a model-sized write; the standing corpus is never re-hashed. The
  * dedup-rate / cardinality dashboards a training-data pipeline watches
  * (distinct documents per language, distinct urls per day) read a
  * model-sized fold, not the corpus. */
object SketchStream {

  private def foldRegisters(groupCols: Seq[String])(df: DataFrame): DataFrame =
    df.groupBy((groupCols.map(col) :+ col("__idx")): _*)
      .agg(max(col("__M")).as("__M"))

  /** Write the standing corpus's register relation as `root/v0`. */
  def writeStanding(spark: SparkSession, root: String, standing: DataFrame,
      groupCols: Seq[String], valueCol: String, p: Int = 8): Unit =
    Profiling.hllRegisters(standing, groupCols, valueCol, p)
      .write.mode("overwrite").parquet(s"$root/v0")

  /** The `foreachBatch` callback: batch registers → `root/v{batchId+1}`,
    * under the family's standing-store + lineage-fork guards. */
  def advanceBatch(spark: SparkSession, root: String,
      groupCols: Seq[String], valueCol: String, p: Int = 8,
      autoCompactVersions: Option[Int] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    guardStore(spark, root, batchId)
    autoCompactVersions.foreach(k =>
      Versions.autoCompact(spark, root, batchId, k, foldRegisters(groupCols)))
    Profiling.hllRegisters(batch, groupCols, valueCol, p)
      .write.mode("overwrite").parquet(s"$root/v${batchId + 1}")
  }

  /** The folded register relation over every delta `<= upTo` —
    * model-sized, exact by max-merge associativity. */
  def readRegisters(spark: SparkSession, root: String,
      groupCols: Seq[String], upTo: Long = Long.MaxValue): DataFrame = {
    val versions = Versions.list(spark, root).filter(_._1 <= upTo)
    require(versions.nonEmpty, s"no register versions at $root")
    foldRegisters(groupCols)(
      spark.read.parquet(versions.map(_._2.toString): _*))
  }

  /** The live cardinality estimate — bit-identical to
    * [[Profiling.hllDistinct]] over the corresponding corpus union. */
  def distinctAt(spark: SparkSession, root: String, groupCols: Seq[String],
      p: Int = 8, upTo: Long = Long.MaxValue): DataFrame =
    Profiling.hllFromRegisters(
      readRegisters(spark, root, groupCols, upTo), groupCols, p)

  /** Fold register deltas `v0..v<upTo>` into a new base (see
    * [[Versions.compact]]); the max-merge is read-equivalent by
    * associativity (and idempotent besides). */
  def compactStore(spark: SparkSession, root: String,
      groupCols: Seq[String], upTo: Long): Unit =
    Versions.compact(spark, root, upTo, foldRegisters(groupCols))

  // ---- count-min (frequency) ---------------------------------------------
  // The COUNTING sibling: per-batch counter deltas (d×w rows, model-sized)
  // folding by (j, bucket)-wise SUM. Counter sums are associative but NOT
  // idempotent — unlike the HLL registers above, a duplicated delta WOULD
  // overcount, which is exactly why the family's exactly-once conventions
  // (batch-id-named deltas, deterministic overwrite, lineage guard) are
  // load-bearing here. Folded == one-shot is structural all the same: the
  // counter table of a union is the sum of per-part counter tables.

  private def foldCounters(df: DataFrame): DataFrame =
    df.groupBy(col("j"), col("bucket"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  private def guardStore(spark: SparkSession, root: String,
      batchId: Long): Unit = {
    val versions = Versions.list(spark, root)
    require(versions.exists(_._1 == 0L),
      s"standing store $root/v0 missing — writeStanding before " +
        "starting the stream")
    versions.lastOption.foreach { case (newest, _) =>
      require(newest <= batchId + 1,
        s"store at $root is at v$newest but the stream is replaying " +
          s"batch $batchId — restarting with a fresh checkpoint over " +
          "existing deltas would fork their lineage; resume from the " +
          "original checkpoint or start new roots")
    }
  }

  /** Write the standing corpus's count-min counters as `root/v0`. */
  def writeStandingCm(spark: SparkSession, root: String, standing: DataFrame,
      keyCol: String, d: Int = 4, w: Int = 1024): Unit =
    Profiling.countMinSketch(standing, keyCol, d, w)
      .write.mode("overwrite").parquet(s"$root/v0")

  /** The `foreachBatch` callback for the counter store. */
  def advanceBatchCm(spark: SparkSession, root: String, keyCol: String,
      d: Int = 4, w: Int = 1024, autoCompactVersions: Option[Int] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    guardStore(spark, root, batchId)
    autoCompactVersions.foreach(k =>
      Versions.autoCompact(spark, root, batchId, k, foldCounters))
    Profiling.countMinSketch(batch, keyCol, d, w)
      .write.mode("overwrite").parquet(s"$root/v${batchId + 1}")
  }

  /** The folded counter table over every delta `<= upTo` — model-sized
    * (≤ d·w rows), exact by integer-sum associativity. */
  def readCounters(spark: SparkSession, root: String,
      upTo: Long = Long.MaxValue): DataFrame = {
    val versions = Versions.list(spark, root).filter(_._1 <= upTo)
    require(versions.nonEmpty, s"no counter versions at $root")
    foldCounters(spark.read.parquet(versions.map(_._2.toString): _*))
  }

  /** Live point estimates — bit-identical to [[Profiling.countMinLookup]]
    * against a one-shot sketch of the corpus union (structural
    * overestimate n_cms ≥ true count included). */
  def lookupAt(spark: SparkSession, root: String, keys: DataFrame,
      keyCol: String, d: Int = 4, w: Int = 1024,
      upTo: Long = Long.MaxValue): DataFrame =
    Profiling.countMinLookup(keys, keyCol,
      readCounters(spark, root, upTo), d, w)

  /** Fold counter deltas `v0..v<upTo>` into a new base (sum-merge —
    * read-equivalent by associativity). */
  def compactStoreCm(spark: SparkSession, root: String, upTo: Long): Unit =
    Versions.compact(spark, root, upTo, foldCounters)
}
