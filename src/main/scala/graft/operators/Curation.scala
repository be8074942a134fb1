package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Corpus-curation compositions — the end-to-end shapes a training-data
  * pipeline actually runs, built from the primitive operators so the whole
  * flow stays one Catalyst plan (filters push into the scan, dedup is one
  * exchange, no materialization between stages).
  */
object Curation {

  /** Keep documents scoring at least `minQuality`, then exact-dedup on
    * `textCol` keeping the lowest id. One scan + one exchange. */
  def filterAndDedup(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double): DataFrame = {
    val scored = docs
      .withColumn("__toks", TF.tokens(col(textCol)))
      .withColumn("quality",
        TF.qualityScoreFromTokens(col(textCol), col("__toks")))
      .drop("__toks")
      .filter(col("quality") >= minQuality)
    Dedup.exactKept(scored, idCol, Seq(textCol))
  }

  /** Deterministic train/val/test assignment by multiplicative hashing of a
    * numeric id — stable across runs, clusters, and engines (plain int
    * arithmetic, no library hash), uniform enough for splitting. Returns the
    * input plus a `split` column. `fractions` maps split name → share;
    * shares must sum to ≤ 1 (remainder falls into the last split). */
  def hashSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9)
    // Knuth multiplicative hash, kept within long range for oracle parity
    val bucket = pmod(col(idCol) * lit(2654435761L), lit(1000000007L)) % 1000
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    val expr = fractions.zip(cuts).reverse
      .foldLeft(lit(fractions.last._1): Column) { case (acc, ((name, _), cut)) =>
        when(bucket < cut * 1000, lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }
}
