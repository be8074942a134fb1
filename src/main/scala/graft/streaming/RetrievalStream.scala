package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Streaming inverted-index maintenance — the sparse-RETRIEVAL member of
  * the incremental family (exact fps → [[PassageStream]], MinHash bands →
  * [[NearDupStream]], IVF cells → [[IvfStream]], PCA moments →
  * [[PcaStream]]; this closes the index-family matrix). Each document
  * micro-batch tokenizes ONLY its own docs and appends two deltas under
  * one root:
  *
  *   - `root/post/v*` — the batch's posting relation (term, doc_id, tf,
  *     dl). Postings are DISJOINT across batches (every (doc, term) row
  *     belongs to exactly one doc, and a doc arrives in exactly one
  *     batch), so the assembled posting table is the PLAIN union of
  *     deltas — zero exchanges on read, the [[IvfStream.readIndex]]
  *     discipline — and equals the one-shot
  *     [[Retrieval.postingsRelation]] over the union row-for-row.
  *   - `root/stats/v*` — the batch's 1-row (n_docs, total_dl). Exact
  *     integer sums are associative, so the assembled stats fold equals
  *     the one-shot corpus stats exactly (MODEL-sized deltas: one row
  *     per batch, like [[PcaStream]]'s moments).
  *
  * Probes ([[bm25TopK]]) therefore score BIT-IDENTICALLY to
  * [[Retrieval.bm25TopK]] over the assembled corpus: same filtered tf
  * rows, same df counts, same broadcast stats, same decimal-staged sum —
  * which is exactly what the p108 oracle replays. Unlike
  * [[Retrieval.writeInvertedIndex]] (whose side table PINS build-time
  * stats), the streamed index's stats fold tracks the assembled corpus,
  * so a probe always scores against the corpus it actually searches.
  *
  * At 100 TB: per-batch cost is one batch-sized tokenize+tf scan + a
  * model-sized stats row; the standing corpus is never re-tokenized. The
  * query-vocabulary filter pushes into every delta's parquet scan, so a
  * probe reads only matching term rows; the df aggregation exchanges
  * query-vocabulary rows only (the [[Retrieval.bm25TopK]] bound). Fold
  * deltas into the term-bucketed [[Retrieval.writeInvertedIndex]] layout
  * offline when probe traffic dominates ingest. */
object RetrievalStream {

  private def postRoot(root: String) = s"$root/post"
  private def statsRoot(root: String) = s"$root/stats"

  /** Write the standing corpus's postings + stats as the two `v0`s
    * (both roots live-root-guarded: [[Versions.guardStandingWrite]]). */
  def writeStanding(spark: SparkSession, root: String, standing: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): Unit = {
    Versions.guardStandingWrite(spark, postRoot(root))
    Versions.guardStandingWrite(spark, statsRoot(root))
    Retrieval.postingsRelation(standing, idCol, textCol)
      .write.mode("overwrite").parquet(s"${postRoot(root)}/v0")
    Retrieval.statsRelation(standing, idCol, textCol)
      .write.mode("overwrite").parquet(s"${statsRoot(root)}/v0")
  }

  /** The `foreachBatch` callback: tokenize batch `batchId`'s docs only,
    * append posting + stats deltas as `v{batchId+1}`. Postings land
    * first (the larger correctness-bearing artifact); a crash between
    * the writes is healed by the checkpointed redelivery overwriting
    * both deterministically. */
  def appendBatch(spark: SparkSession, root: String,
      idCol: String = "doc_id", textCol: String = "text",
      autoCompactVersions: Option[Int] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    Versions.guardAppend(spark, postRoot(root), "postings", batchId,
      "writeStanding before starting the stream")
    // BOTH standing roots, like every other two-root store: a
    // writeStanding that crashed between the postings and stats writes
    // would otherwise stream over stats that exclude the standing corpus
    // — silently wrong idf/length normalization on every probe
    require(Versions.list(spark, statsRoot(root)).exists(_._1 == 0L),
      s"standing stats ${statsRoot(root)}/v0 missing (postings v0 exists " +
        "— a writeStanding crashed between its two writes); re-run " +
        "writeStanding before starting the stream")
    autoCompactVersions.foreach { k =>
      Versions.autoCompact(spark, postRoot(root), batchId, k)
      Versions.autoCompact(spark, statsRoot(root), batchId, k, foldStats)
    }
    val b = batch.localCheckpoint(true)
    Retrieval.postingsRelation(b, idCol, textCol)
      .write.mode("overwrite").parquet(s"${postRoot(root)}/v${batchId + 1}")
    Retrieval.statsRelation(b, idCol, textCol)
      .write.mode("overwrite").parquet(s"${statsRoot(root)}/v${batchId + 1}")
  }

  private def foldStats(df: DataFrame): DataFrame =
    df.agg(sum(col("n_docs")).cast("long").as("n_docs"),
      sum(col("total_dl")).cast("long").as("total_dl"))

  /** The assembled posting relation: plain union, zero exchanges (rows
    * disjoint across deltas by construction). */
  def readPostings(spark: SparkSession, root: String,
      upTo: Long = Long.MaxValue): DataFrame = {
    val versions = Versions.list(spark, postRoot(root)).filter(_._1 <= upTo)
    require(versions.nonEmpty, s"no posting versions at ${postRoot(root)}")
    spark.read.parquet(versions.map(_._2.toString): _*)
  }

  /** The assembled 1-row stats: exact integer fold of the deltas. */
  def readStats(spark: SparkSession, root: String,
      upTo: Long = Long.MaxValue): DataFrame = {
    val versions = Versions.list(spark, statsRoot(root)).filter(_._1 <= upTo)
    require(versions.nonEmpty, s"no stats versions at ${statsRoot(root)}")
    foldStats(spark.read.parquet(versions.map(_._2.toString): _*))
  }

  /** BM25 top-k over the assembled index — bit-identical to
    * [[Retrieval.bm25TopK]] over the corpus union. */
  def bm25TopK(spark: SparkSession, root: String, queryTerms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      upTo: Long = Long.MaxValue): DataFrame =
    Retrieval.bm25TopKOver(readPostings(spark, root, upTo),
      readStats(spark, root, upTo), queryTerms, k, k1, b)

  /** Fold both stores' deltas `v0..v<upTo>` into new bases (postings by
    * identity — rows disjoint; stats by the integer fold). */
  def compactStore(spark: SparkSession, root: String, upTo: Long): Unit = {
    Versions.compact(spark, postRoot(root), upTo)
    Versions.compact(spark, statsRoot(root), upTo, foldStats)
  }
}
