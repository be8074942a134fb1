package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as built-ins, composed Spark-first (preference
  * order per the build brief: compose existing ops before custom plans).
  *
  * As-of join: for every left row, the latest right row with the same key
  * and `rightTime <= leftTime` (direction "backward"; "forward" takes the
  * earliest right row with `rightTime >= leftTime`). Implemented as a
  * tagged union + one window pass — a single exchange on the key, no
  * range-join explosion:
  *
  *   union(right tagged 0, left tagged 1)
  *     → window over (key) ordered by (time, tag):
  *         carry last non-null right payload
  *     → keep left rows
  *
  * Right rows sort before left rows at equal times (tag 0 < 1), making the
  * match inclusive in either direction. At 100 TB this is shuffle-minimal:
  * both sides exchange once on the key; state per group is one carried row.
  */
object Joins {

  /** `left` gains `asofCols` (renamed with `prefix`) from the matched
    * `right` row per `keyCol`: the latest right row with right.`timeCol` <=
    * left.`timeCol` (`direction = "backward"`, the default) or the earliest
    * with right.`timeCol` >= left.`timeCol` (`"forward"`).
    *
    * `tolerance`: maximum allowed |leftTime − rightTime| — a match farther
    * away yields nulls, exactly like an unmatched row (pandas
    * `merge_asof(tolerance=...)` semantics). Requires a numeric `timeCol`
    * (the repo convention is epoch micros; convert timestamps first). The
    * bound is enforced on the carried match inside the same window pass —
    * no extra exchange.
    *
    * PRECONDITION: `right` must be unique per (key, time) — pre-aggregate if
    * not, or the carried value at a tied timestamp is undefined.
    * `validateUnique = true` enforces this inside the plan: adjacent
    * same-(key,time) right rows are detected with a `lag` over the same
    * partition/order as the carry window (one shared sort, no extra
    * exchange) and fail the job with a clear error instead of silently
    * picking one. Keep it on in debug/backfill runs; at 100 TB the check
    * costs two extra window columns, not a pass.
    *
    * Skew note: one hot key (a bot user, a null-ish default key) serializes
    * into a single window partition. That is inherent to as-of semantics —
    * the carry is a running scan per key — so the mitigation is upstream:
    * drop or split known-degenerate keys before joining (the same guard
    * `Dedup.bucketPairs` applies to degenerate buckets). */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      asofCols: Seq[String], prefix: String = "asof_",
      validateUnique: Boolean = false,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")
    val leftCols = left.columns.toSeq
    val tagged =
      right.select(
          Seq(col(keyCol), col(timeCol).as("__t"), lit(0).as("__tag")) ++
          leftCols.filterNot(c => c == keyCol).map(c => lit(null).as(c)) ++
          asofCols.map(c => col(c).as(s"$prefix$c")): _*)
        .unionByName(
          left.select(
            Seq(col(keyCol), col(timeCol).as("__t"), lit(1).as("__tag")) ++
            leftCols.filterNot(c => c == keyCol).map(col) ++
            asofCols.map(c => lit(null).as(s"$prefix$c")): _*))

    // forward = backward on reversed time: right rows still sort first at
    // equal times (tag asc), so >= stays inclusive
    val tOrd = if (direction == "backward") col("__t").asc else col("__t").desc
    val ord = Window.partitionBy(col(keyCol)).orderBy(tOrd, col("__tag").asc)
    val w = ord.rowsBetween(Window.unboundedPreceding, 0)

    // duplicate (key, time) right rows sort adjacently (both __tag = 0), so
    // a lag over the carry window's own sort detects them row-by-row
    val checked =
      if (!validateUnique) tagged
      else {
        // null-safe (<=>): lag is NULL on each partition's first row, and a
        // NULL predicate would make assert_true throw spuriously
        val dup = col("__tag") === 0 &&
          (lag(col("__tag"), 1).over(ord) <=> 0) &&
          (lag(col("__t"), 1).over(ord) <=> col("__t"))
        tagged
          .withColumn("__unique_ok", coalesce(
            assert_true(!dup, concat(
              lit(s"asOf: right side has duplicate ($keyCol, $timeCol) at key="),
              col(keyCol).cast("string"), lit(" time="),
              col("__t").cast("string"))),
            lit(true)))
          .filter(col("__unique_ok")).drop("__unique_ok")
      }

    // carry the matched right row's own time alongside its payload so a
    // tolerance bound can be applied to the match distance
    val withRt = checked.withColumn("__rt",
      when(col("__tag") === 0, col("__t")))
    val carried = (asofCols.map(c => s"$prefix$c") :+ "__rt")
      .foldLeft(withRt) { (df, c) =>
        df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
    val bounded = tolerance match {
      case None => carried
      case Some(tol) =>
        val dist =
          if (direction == "backward") col("__t") - col("__rt")
          else col("__rt") - col("__t")
        // an out-of-tolerance match degrades to no-match (nulls); a true
        // no-match has __rt null, so `dist <= tol` is null and when() nulls
        // the payload either way
        asofCols.foldLeft(carried) { (df, c) =>
          df.withColumn(s"$prefix$c",
            when(dist <= tol, col(s"$prefix$c")))
        }
    }
    bounded.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        asofCols.map(c => col(s"$prefix$c")): _*)
  }

  /** Interval-overlap equi-join: all (left, right) row pairs with equal
    * `keyCols` whose half-open intervals `[lStart, lEnd) × [rStart, rEnd)`
    * overlap (`lStart < rEnd AND rStart < lEnd`).
    *
    * The naive plan is an equi-join on the keys followed by the range
    * predicate — quadratic in rows-per-key — or, keyless, a
    * BroadcastNestedLoopJoin that cannot scale. This operator uses the
    * standard bin-join decomposition instead: each interval explodes into
    * the fixed-width time bins it covers, the join runs as a pure equi-join
    * on (keys, bin) — one shuffle per side, AQE/skew-handling eligible,
    * never a cartesian — and each surviving pair is emitted EXACTLY ONCE
    * without any post-join `distinct`: a pair is kept only in the first bin
    * its intersection covers (`bin == floor(max(starts) / width)`), a bin
    * both sides are guaranteed to have generated. At 100 TB the only knob is
    * `binWidth`: ~the median interval length keeps the per-interval fanout
    * at 1–2 bins while keeping per-(key, bin) groups small.
    *
    * Times are numeric and must be NONNEGATIVE (repo convention: epoch
    * micros) — `div` is truncating division, which equals floor division
    * only on the nonnegative domain. Empty or inverted intervals
    * (`end <= start`) match nothing and are dropped before the explode
    * (Spark's `sequence(a, b)` would otherwise step BACKWARD for b < a and
    * fabricate bins). Column names must be disjoint across the two inputs
    * apart from `keyCols` (rename before joining, as with any self-join). */
  def intervalOverlap(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    require(keyCols.nonEmpty,
      "keyless interval joins don't scale — provide at least one key")
    // Exact floor division on the nonnegative domain without `div`-by-name
    // string plumbing: subtract the remainder first, so the final `/` always
    // divides an exact multiple (IEEE-exact for any numerator < 2^53). The
    // domain is ENFORCED, not assumed: a negative time (pmod ≠ mod there)
    // or one at/above 2^53 (double rounding) would silently mis-bin, so it
    // raises in the executor instead.
    def fdiv(c: Column): Column = {
      val checked = when(c >= 0 && c < lit(1L << 53), c)
        .otherwise(raise_error(concat(
          lit("intervalOverlap time outside [0, 2^53): "), c.cast("string"))))
      ((checked - pmod(checked, lit(binWidth))) / lit(binWidth)).cast("long")
    }
    def binned(df: DataFrame, s: String, e: String): DataFrame =
      df.filter(col(e) > col(s))
        .withColumn("__bin",
          explode(sequence(fdiv(col(s).cast("long")),
            fdiv(col(e).cast("long") - 1))))
    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd)
    l.join(r, keyCols :+ "__bin")
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .filter(col("__bin") ===
        fdiv(greatest(col(lStart), col(rStart)).cast("long")))
      .drop("__bin")
  }
}
