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
    val withDl = docs
      .select(col(idCol).as("__id"), TF.tokens(col(textCol)).as("__toks"))
      .select(col("__id"), col("__toks"), size(col("__toks")).as("__dl"))
    // One tiny row (count, total length) — broadcast into the score plan.
    val stats = withDl.agg(
      count(lit(1)).as("__n_docs"), sum(col("__dl")).as("__total_dl"))
    // dl rides along as a grouping key (constant per doc): tf and dl in one
    // exchange, and only query-vocabulary rows ever shuffle.
    val tf = withDl
      .select(col("__id"), col("__dl"), explode(col("__toks")).as("__term"))
      .filter(col("__term").isInCollection(queryTerms))
      .groupBy(col("__id"), col("__dl"), col("__term"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy(col("__term")).agg(count(lit(1)).as("__df"))

    val nD = col("__n_docs").cast(DoubleType)
    val dfD = col("__df").cast(DoubleType)
    val tfD = col("__tf").cast(DoubleType)
    val dlD = col("__dl").cast(DoubleType)
    // Association mirrored exactly by the SQL oracle — do not refactor the
    // parenthesisation without updating both sides.
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
}
