package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`) — brute-force
  * cosine top-k as the exact baseline, and a random-hyperplane-LSH bucketed
  * variant as the scale path. North-star extensions (SURVEY.md §2c).
  *
  * Scale posture (100 TB):
  *   - The query side is assumed small (ad-hoc probes / a batch of centroid
  *     queries) and is broadcast; the corpus never shuffles for the join.
  *   - Brute force is O(|Q|·|corpus|) dot products but embarrassingly
  *     parallel and scan-shaped — the right baseline, and often the right
  *     answer when |Q| is small.
  *   - The LSH path prunes the corpus per query to matching sign-buckets
  *     across `tables` independent hash tables (union of candidates, exact
  *     rerank). Buckets are computed once per corpus and are joinable —
  *     at scale you'd persist them as a bucketed table and skip the rebuild.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector, the k nearest corpus vectors.
    * Returns (query_id, rank, neighbor_id, sim). Ties broken by neighbor id.
    * `queries` must be broadcast-sized. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Corpus bucketed by `tables` independent sign-bit LSH tables of
    * `bits` hyperplanes each: one row per (vector, table). */
  def lshBuckets(
      df: DataFrame, tables: Int, bits: Int, dim: Int, seed: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val tableCols = (0 until tables).map { t =>
      val planes = seededPlanes(bits, dim, seed + t * 7919L)
      struct(lit(t).as("table"),
        hyperplaneBucket(col(vecCol), planes).as("bucket"))
    }
    df.select(col(idCol).as("id"), col(vecCol).as("v"),
        explode(array(tableCols: _*)).as("tb"))
      .select(col("id"), col("v"),
        col("tb.table").as("table"), col("tb.bucket").as("bucket"))
  }

  /** Approximate top-k: candidates = corpus vectors sharing any LSH bucket
    * with the query (union over `tables` tables), exact-cosine reranked.
    * Same output shape as [[bruteForceTopK]]; recall < 1 by design. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      tables: Int = 8, bits: Int = 12, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = lshBuckets(corpus, tables, bits, dim, seed, idCol, vecCol)
    val qb = broadcast(lshBuckets(queries, tables, bits, dim, seed, idCol, vecCol)
      .withColumnRenamed("id", "query_id").withColumnRenamed("v", "qv"))
    val candidates = cb.join(qb, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("qv"),
        col("id").as("neighbor_id"), col("v").as("cv"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    candidates.withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Embedding-level near-duplicate pairs: corpus×corpus restricted to
    * shared LSH buckets, kept when cosine ≥ `threshold`.
    * Returns (id_a, id_b, sim), id_a < id_b. */
  def embeddingNearDupPairs(
      corpus: DataFrame, threshold: Double, dim: Int,
      tables: Int = 8, bits: Int = 12, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cb = lshBuckets(corpus, tables, bits, dim, seed, idCol, vecCol)
    val a = cb.select(col("table"), col("bucket"),
      col("id").as("id_a"), col("v").as("v_a"))
    val b = cb.select(col("table"), col("bucket"),
      col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", cosine(col("v_a"), col("v_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
