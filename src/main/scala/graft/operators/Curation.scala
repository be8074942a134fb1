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
    // Knuth multiplicative hash. The id is reduced mod p BEFORE the multiply
    // so the product stays < 2^63 for any long id (max ~1e9 * 2654435761 ≈
    // 2.65e18): no ANSI-mode overflow at 100 TB id ranges, and the same
    // arithmetic is expressible in the DuckDB oracle (which errors on BIGINT
    // overflow rather than wrapping).
    // COMPAT: the mod-first form (introduced after the first release of this
    // operator) assigns different buckets than the old multiply-first form
    // for ids in [1000000007, ~3.47e9); any split persisted by the old form
    // must be regenerated, not mixed.
    val bucket =
      pmod(pmod(col(idCol), lit(1000000007L)) * lit(2654435761L),
        lit(1000000007L)) % 1000
    // Integer bucket thresholds, rounded once — avoids double-precision cut
    // points like 0.85*1000 = 850.0000000000001 misassigning bucket 850.
    val cuts = fractions.scanLeft(0.0) { case (acc, (_, f)) => acc + f }
      .tail.map(c => math.round(c * 1000))
    val expr = fractions.zip(cuts).reverse
      .foldLeft(lit(fractions.last._1): Column) { case (acc, ((name, _), cut)) =>
        when(bucket < lit(cut), lit(name)).otherwise(acc)
      }
    df.withColumn("split", expr)
  }
}
