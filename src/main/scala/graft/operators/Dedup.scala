package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions, TextFunctions}

/** Deduplication operators for corpus curation — exact, MinHash-LSH,
  * SimHash, and n-gram-Jaccard near-dup. North-star extensions (SURVEY.md
  * §2c): the reference framework has no dedup capability at all.
  *
  * Scale posture (100 TB):
  *   - Exact dedup is one hash aggregation — shuffles each key once, partial
  *     aggregation halves the wire volume, AQE splits skewed keys.
  *   - Near-dup never does an all-pairs comparison. Candidate generation is
  *     banded LSH: docs only meet inside a (band, hash) bucket, so the join
  *     fans out per-bucket, not per-corpus. Degenerate buckets (boilerplate
  *     shingles shared by millions of docs) are capped at `maxBucketSize` —
  *     the standard guard against quadratic bucket blowup; dropped buckets
  *     only lose candidates that other, rarer bands will usually re-surface.
  *   - Verification (exact Jaccard / Hamming) runs only on candidate pairs.
  */
object Dedup {

  /** Exact dedup on `keyCols`: one representative row key (min id) per
    * distinct key, plus the duplicate count. Deterministic, unlike
    * `dropDuplicates` (which keeps an arbitrary row per key). */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Rows that survive exact dedup (the keep-side projection). */
  def exactKept(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash-LSH near-duplicate pairs.
    *
    * shingle(text) → minhash signature (`numHashes` slots) → `bands` bands of
    * `numHashes/bands` rows each, each band hashed to one bucket key → docs
    * sharing any band bucket become candidates → exact shingle-set Jaccard
    * verifies → pairs with jaccard ≥ `threshold`.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16,
      shingleSize: Int = 3, threshold: Double = 0.6,
      maxBucketSize: Int = 200, seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands

    val shingles = array_distinct(TextFunctions.tokenShingles(
      TextFunctions.tokens(col(textCol)), shingleSize))
    val sig = docs.select(col(idCol).as("id"), shingles.as("sh"))
      .withColumn("sig", HashFunctions.minhashSignature(col("sh"), numHashes, seed))

    // one row per (doc, band): bucket = hash of the band's signature slice
    val banded = sig.select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

    // guard: drop degenerate buckets before the self-join fans out
    val wb = Window.partitionBy(col("band"), col("bucket"))
    val pruned = banded
      .withColumn("__bsz", count(lit(1)).over(wb))
      .filter(col("__bsz") <= maxBucketSize)
      .drop("__bsz")

    val a = pruned.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = pruned.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val candidates = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .dropDuplicates("id_a", "id_b")

    candidates
      .withColumn("jaccard", jaccardExpr(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact Jaccard over two (distinct-element) arrays, as int arithmetic
    * surfaced through one double division. */
  def jaccardExpr(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val uni = size(array_union(a, b))
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** SimHash near-duplicate pairs: 64-bit SimHash per doc; candidates share
    * at least one of four 16-bit chunks (pigeonhole: any pair within Hamming
    * distance ≤ 3 shares a chunk... up to distance `4-1`); verified by exact
    * Hamming distance ≤ `maxHamming`. Returns (id_a, id_b, hamming). */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 500): DataFrame = {
    val hashed = docs.select(col(idCol).as("id"),
      HashFunctions.simhash64(TextFunctions.tokens(col(textCol))).as("sh64"))

    val chunked = hashed.select(col("id"), col("sh64"),
        posexplode(array((0 until 4).map(c =>
          shiftrightunsigned(col("sh64"), c * 16).bitwiseAND(lit(0xffffL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ckey")

    val wb = Window.partitionBy(col("chunk"), col("ckey"))
    val pruned = chunked
      .withColumn("__bsz", count(lit(1)).over(wb))
      .filter(col("__bsz") <= maxBucketSize)
      .drop("__bsz")

    val a = pruned.select(col("chunk"), col("ckey"),
      col("id").as("id_a"), col("sh64").as("h_a"))
    val b = pruned.select(col("chunk"), col("ckey"),
      col("id").as("id_b"), col("sh64").as("h_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
