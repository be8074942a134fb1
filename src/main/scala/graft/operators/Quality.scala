package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}

/** Repetition-profile quality filters — the Gopher-family (Rae et al. 2021,
  * "Scaling Language Models", App. A1) per-document repetitiousness signals
  * a training-data pipeline runs over every crawled page: repeated n-grams
  * and token runs are the strongest cheap predictors of boilerplate /
  * machine-generated text.
  *
  * Everything here is a pure per-row projection over the token array — no
  * shuffle, no join, no state; at 100 TB the cost is the scan itself, and
  * Catalyst fuses the whole thing into one WholeStageCodegen span over the
  * parquet read. All ratios are exact-integer counts divided once at the
  * end (`int / int` in DOUBLE), so the DuckDB oracle replays every value
  * bit-for-bit — no `ln`/entropy-style ulp risk anywhere.
  *
  * The reference has no quality stage at all — its map step is an opaque
  * user function (`/root/reference/Worker.fs:20`); this is the §2c
  * "text analysis" north-star extended to the repetition family.
  */
object Quality {

  /** Per-document repetition statistics + a keep/drop verdict.
    *
    * Output columns:
    *   - `n_toks`           token count
    *   - `distinct_ratio`   |distinct tokens| / n_toks (0.0 for empty docs)
    *   - `top_bigram_frac`  occurrences of the most frequent adjacent
    *                        bigram / total bigrams (1.0 for docs < 2 toks)
    *   - `dup_bigram_frac`  fraction of bigram occurrences whose bigram
    *                        appears more than once (0.0 for docs < 2 toks)
    *   - `max_run`          longest run of consecutive equal tokens
    *   - `keep`             conjunction of the caller's thresholds
    *
    * The per-doc bigram mode is computed over a SORTED copy of the bigram
    * array rather than explode + groupBy (a shuffle keyed by (doc, bigram)
    * would move n_docs × d rows per scan where the projection moves zero)
    * and rather than the distinct×filter HOF nest (O(d²) compares per doc —
    * one pathological 100k-token web page would cost 10¹⁰ string compares
    * in a single task). Sorting groups equal bigrams adjacently, so the
    * top-bigram count is the longest equal-neighbor run (the same packed
    * BIGINT fold as `max_run`, applied to the sorted array) and the
    * duplicated-occurrence count is `total − singletons` where a singleton
    * is an element differing from both neighbors — O(d log d) sort + two
    * linear passes, so cost is the scan for any real doc length. The
    * run-length folds pack (current_run, best_run) into one BIGINT
    * (`run·10⁹ + best`) so the identical fold replays in DuckDB's
    * single-typed `list_reduce`; this caps supported doc length at 10⁹
    * tokens.
    *
    * Thresholds: a doc is kept when `distinct_ratio >= minDistinctRatio`,
    * `top_bigram_frac <= maxTopBigramFrac`, `dup_bigram_frac <=
    * maxDupBigramFrac` and `max_run <= maxRun`. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String,
      minDistinctRatio: Double = 0.5, maxTopBigramFrac: Double = 0.10,
      maxDupBigramFrac: Double = 0.55, maxRun: Int = 2): DataFrame = {
    docs
      .select(col(idCol), TF.tokens(col(textCol)).as("toks"))
      // guarded: sequence(0, -2) would DESCEND for sub-2-token docs; every
      // consumer also guards on size(toks) < 2, this just keeps bg sane
      .withColumn("bg", expr(
        """CASE WHEN size(toks) < 2 THEN CAST(array() AS ARRAY<STRING>)
          |ELSE transform(sequence(0, size(toks) - 2),
          |  i -> concat(toks[i], ' ', toks[i + 1])) END""".stripMargin))
      .withColumn("sb", expr("array_sort(bg)"))
      .select(
        col(idCol),
        size(col("toks")).as("n_toks"),
        expr("""CASE WHEN size(toks) = 0 THEN CAST(0.0 AS DOUBLE)
               |ELSE CAST(size(array_distinct(toks)) AS DOUBLE)
               |     / CAST(size(toks) AS DOUBLE) END""".stripMargin)
          .as("distinct_ratio"),
        // top bigram count = longest equal-neighbor run in the SORTED
        // bigram array (the max_run fold, applied to sb); the inner CASE
        // guards sequence(1, 0) descending for single-bigram docs
        expr("""CASE WHEN size(toks) < 2 THEN CAST(1.0 AS DOUBLE)
               |ELSE CAST(CASE WHEN size(sb) < 2 THEN size(sb)
               |  ELSE CAST(aggregate(sequence(1, size(sb) - 1),
               |    CAST(1000000001 AS BIGINT),
               |    (acc, i) -> CASE WHEN sb[i] = sb[i - 1]
               |      THEN ((acc div 1000000000) + 1) * 1000000000
               |           + greatest(acc % 1000000000,
               |                      (acc div 1000000000) + 1)
               |      ELSE 1000000000
               |           + greatest(acc % 1000000000, CAST(1 AS BIGINT))
               |      END) % 1000000000 AS INT) END AS DOUBLE)
               |     / CAST(size(bg) AS DOUBLE) END""".stripMargin)
          .as("top_bigram_frac"),
        // duplicated occurrences = total − singletons; a singleton differs
        // from BOTH sorted neighbors (CASE, not OR: ANSI mode errors on
        // out-of-range element access, and Spark's Or need not short-circuit)
        expr("""CASE WHEN size(toks) < 2 THEN CAST(0.0 AS DOUBLE)
               |ELSE CAST(size(bg) - size(filter(sequence(0, size(sb) - 1),
               |  i -> (CASE WHEN i = 0 THEN true
               |        ELSE sb[i] != sb[i - 1] END)
               |   AND (CASE WHEN i = size(sb) - 1 THEN true
               |        ELSE sb[i] != sb[i + 1] END))) AS DOUBLE)
               |     / CAST(size(bg) AS DOUBLE) END""".stripMargin)
          .as("dup_bigram_frac"),
        expr("""CASE WHEN size(toks) < 2 THEN least(size(toks), 1)
               |ELSE CAST(aggregate(sequence(1, size(toks) - 1),
               |       CAST(1000000001 AS BIGINT),
               |       (acc, i) -> CASE WHEN toks[i] = toks[i - 1]
               |         THEN ((acc div 1000000000) + 1) * 1000000000
               |              + greatest(acc % 1000000000,
               |                         (acc div 1000000000) + 1)
               |         ELSE 1000000000
               |              + greatest(acc % 1000000000, CAST(1 AS BIGINT))
               |         END) % 1000000000 AS INT) END""".stripMargin)
          .as("max_run"))
      .withColumn("keep",
        col("distinct_ratio") >= minDistinctRatio &&
          col("top_bigram_frac") <= maxTopBigramFrac &&
          col("dup_bigram_frac") <= maxDupBigramFrac &&
          col("max_run") <= maxRun)
  }
}
