package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{TextFunctions => TF}

/** Sparse text retrieval over a document corpus: BM25 scoring against a
  * fixed query-term set, returning the global top-k.
  *
  * Reference context: nikiwiles/FSharp-MapReduce expresses all analytics as
  * map→shuffle→reduce over a paginated source (Orchestrator.fs:65-163);
  * term-frequency scoring is the canonical MapReduce workload re-expressed
  * here as a declarative Catalyst plan.
  *
  * Scale design (100 TB corpus):
  *   - ONE pass over the corpus tokenizes and explodes; the document length
  *     `dl` is carried through the explode as a grouping key, so tf and dl
  *     come out of the same aggregation — no corpus self-join.
  *   - Rows are filtered to the query vocabulary BEFORE the tf exchange:
  *     only (doc, query-term) pairs shuffle, never the full posting table.
  *   - Document frequencies (≤ |query| rows) and the corpus stats row are
  *     broadcast; the only exchanges are the tf aggregation and the final
  *     per-doc score aggregation.
  *   - The top-k is a `TakeOrderedAndProject` (bounded per-partition
  *     heaps), never a global sort.
  *
  * Numeric parity contract: BM25's idf is the "rational" log-free variant
  * `(N - df + 0.5) / (df + 0.5)` — every term is an IEEE double derived
  * from exact integers, so an oracle that mirrors the association order
  * reproduces the score bit-for-bit; per-doc sums stage through
  * DECIMAL(38,18) (order-free) and renarrow to scale 6 at the boundary.
  */
object Retrieval {

  /** The exploded posting rows for the query vocabulary only:
    * (__id, __dl, __term, __tf). dl rides along as a grouping key (constant
    * per doc): tf and dl come out of one exchange, and only
    * query-vocabulary rows ever shuffle. An empty `queryTerms` keeps every
    * term (index-build mode). */
  private def postings(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String]): DataFrame = {
    val withDl = docs
      .select(col(idCol).as("__id"), TF.tokens(col(textCol)).as("__toks"))
      .select(col("__id"), col("__toks"), size(col("__toks")).as("__dl"))
    val exploded = withDl
      .select(col("__id"), col("__dl"), explode(col("__toks")).as("__term"))
    val filtered =
      if (queryTerms.isEmpty) exploded
      else exploded.filter(col("__term").isInCollection(queryTerms))
    filtered
      .groupBy(col("__id"), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
  }

  /** Corpus stats row (__n_docs, __total_dl) from the pre-explode pass. */
  private def corpusStats(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(TF.tokenCount(col(textCol)).as("__dl"))
      .agg(count(lit(1)).as("__n_docs"), sum(col("__dl")).as("__total_dl"))

  /** Score + bounded top-k over posting rows. `dfreq` (≤ |query| rows) and
    * `stats` (1 row) broadcast; the association order is mirrored exactly
    * by the SQL oracle — do not refactor the parenthesisation without
    * updating both sides. */
  private def scoreTopK(tf: DataFrame, dfreq: DataFrame, stats: DataFrame,
      idCol: String, k: Int, k1: Double, b: Double): DataFrame = {
    val nD = col("__n_docs").cast(DoubleType)
    val dfD = col("__df").cast(DoubleType)
    val tfD = col("__tf").cast(DoubleType)
    val dlD = col("__dl").cast(DoubleType)
    val idf = (nD - dfD + lit(0.5)) / (dfD + lit(0.5))
    val ratio = dlD / (col("__total_dl").cast(DoubleType) / nD)
    val scoreT = idf * ((tfD * lit(k1 + 1.0)) /
      (tfD + (lit(k1) * (lit(1.0 - b) + (lit(b) * ratio)))))

    tf.join(broadcast(dfreq), "__term")
      .crossJoin(broadcast(stats))
      .select(col("__id"), scoreT.cast(DecimalType(38, 18)).as("__sct"))
      .groupBy(col("__id"))
      .agg(sum(col("__sct")).cast(DecimalType(28, 6)).cast(DoubleType)
        .as("score"))
      .orderBy(col("score").desc, col("__id"))
      .limit(k)
      .select(col("__id").as(idCol), col("score"))
  }

  /** Global BM25 top-k for `queryTerms` over `docs(idCol, textCol)`.
    * Output: (idCol, score) — score descending, ties broken by id. */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val tf = postings(docs, idCol, textCol, queryTerms)
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    scoreTopK(tf, dfreq, corpusStats(docs, idCol, textCol), idCol, k, k1, b)
  }

  /** Per-document keyword extraction: the top `k` terms by tf-idf (rational
    * log-free idf, same contract as [[bm25TopK]]) — the cheap salient-term
    * summary a curation pipeline attaches to every document for topic
    * bucketing and mixture control.
    *
    * Scale: the tf aggregation (query-vocab-free: every term), a
    * partial+final df aggregation JOINED back on term, and the per-doc
    * ranking window. df deliberately comes from an aggregation, not a
    * term-partitioned window: a stopword-grade term concentrates its
    * entire posting list into one window partition (the hot-key long
    * tail at 100 TB), while map-side combine collapses the same hot key
    * before the exchange and AQE splits the skewed join. Each score is
    * ONE IEEE product of exactly-derived doubles (no sum), so the oracle
    * reproduces it bit-for-bit without decimal staging.
    *
    * Returns (idCol, rank, term, score). */
  def topKeywords(docs: DataFrame, idCol: String, textCol: String, k: Int)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = postings(docs, idCol, textCol, Nil)
    val stats = corpusStats(docs, idCol, textCol)
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val byDoc = Window.partitionBy(col("__id"))
    val nD = col("__n_docs").cast(DoubleType)
    val dfD = col("__df").cast(DoubleType)
    // association mirrored by the SQL oracle — keep parenthesisation
    val score = col("__tf").cast(DoubleType) *
      ((nD - dfD + lit(0.5)) / (dfD + lit(0.5)))
    tf.join(dfreq, "__term")
      .crossJoin(broadcast(stats))
      .select(col("__id"), col("__term"), score.as("score"))
      .withColumn("rank", row_number().over(
        byDoc.orderBy(col("score").desc, col("__term"))))
      .filter(col("rank") <= k)
      .select(col("__id").as(idCol), col("rank"), col("__term").as("term"),
        col("score"))
  }

  /** The full posting relation (term, doc_id, tf, dl) — the shared build
    * shape of [[writeInvertedIndex]] and the streaming index
    * ([[graft.streaming.RetrievalStream]]). Postings are DISJOINT across
    * disjoint doc sets (each (doc, term) row belongs to exactly one doc),
    * so per-batch posting relations union to the one-shot relation
    * exactly — the property the streaming index's deltas rest on. */
  def postingsRelation(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    postings(docs, idCol, textCol, Nil)
      .select(col("__term").as("term"), col("__id").as("doc_id"),
        col("__tf").as("tf"), col("__dl").as("dl"))

  /** The 1-row stats relation (n_docs, total_dl) — exact integer sums,
    * associative across disjoint doc sets. */
  def statsRelation(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    corpusStats(docs, idCol, textCol)
      .select(col("__n_docs").as("n_docs"), col("__total_dl").as("total_dl"))

  /** The per-doc length relation (doc_id, dl) — one 16-byte row per doc,
    * INCLUDING zero-token docs (which [[postingsRelation]] necessarily
    * omits: they have no posting rows but still count in
    * [[statsRelation]]'s n_docs). This is the artifact that makes a
    * takedown's stats retraction EXACT: subtracting a deleted doc's
    * (1, dl) from the stats fold needs its dl, and the posting relation
    * alone cannot distinguish "doc never ingested" from "doc ingested
    * with no tokens". */
  def doclenRelation(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol).as("doc_id"),
      TF.tokenCount(col(textCol)).as("dl"))

  /** BM25 top-k over an EXISTING posting relation + stats row (the
    * [[postingsRelation]]/[[statsRelation]] schema) — scores bit-identical
    * to [[bm25TopK]] over the corpus the relations were built from (same
    * filtered tf rows, same df counts, same decimal-staged sum). */
  def bm25TopKOver(postings: DataFrame, stats: DataFrame,
      queryTerms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75,
      idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val tf = postings
      .filter(col("term").isInCollection(queryTerms))
      .select(col("doc_id").as("__id"), col("dl").as("__dl"),
        col("term").as("__term"), col("tf").as("__tf"))
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    scoreTopK(tf, dfreq,
      stats.select(col("n_docs").as("__n_docs"),
        col("total_dl").as("__total_dl")),
      idCol, k, k1, b)
  }

  /** Persist the FULL posting table bucketed by term — the sparse-retrieval
    * sibling of the LSH/IVF index tables: tokenization and the tf exchange
    * are paid ONCE, and every later probe reads term-bucketed postings
    * whose document-frequency aggregation needs no exchange at all (the
    * bucket layout IS the grouping key). A 1-row `<table>__stats` side
    * table pins (n_docs, total_dl) at build time, so probe scores are
    * identical whether or not the live corpus moved on. */
  def writeInvertedIndex(docs: DataFrame, idCol: String, textCol: String,
      table: String, buckets: Int = 32): Unit = {
    postingsRelation(docs, idCol, textCol)
      .write.mode("overwrite")
      .bucketBy(buckets, "term").sortBy("term")
      .format("parquet").saveAsTable(table)
    statsRelation(docs, idCol, textCol)
      .write.mode("overwrite").format("parquet").saveAsTable(s"${table}__stats")
  }

  /** BM25 top-k probing a [[writeInvertedIndex]] table: no tokenization, no
    * corpus scan — just a filtered read of the term buckets, an
    * exchange-free df aggregation (asserted in RetrievalCurationSpec), and
    * the same broadcast score plan as [[bm25TopK]]. Scores are
    * bit-identical to the direct path on the indexed snapshot. */
  def bm25TopKIndexed(spark: org.apache.spark.sql.SparkSession, table: String,
      idCol: String, queryTerms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val tf = spark.table(table)
      .filter(col("term").isInCollection(queryTerms))
      .select(col("doc_id").as("__id"), col("dl").as("__dl"),
        col("term").as("__term"), col("tf").as("__tf"))
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val stats = spark.table(s"${table}__stats")
      .select(col("n_docs").as("__n_docs"), col("total_dl").as("__total_dl"))
    scoreTopK(tf, dfreq, stats, idCol, k, k1, b)
  }
}
