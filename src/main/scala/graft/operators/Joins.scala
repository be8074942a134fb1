package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as built-ins, composed Spark-first (preference
  * order per the build brief: compose existing ops before custom plans).
  *
  * As-of join: for every left row, the latest right row with the same key
  * and `rightTime <= leftTime`. Implemented as a tagged union + one window
  * pass — a single exchange on the key, no range-join explosion:
  *
  *   union(right tagged 0, left tagged 1)
  *     → window over (key) ordered by (time, tag):
  *         carry last non-null right payload
  *     → keep left rows
  *
  * Right rows sort before left rows at equal times (tag 0 < 1), making the
  * match inclusive. At 100 TB this is shuffle-minimal: both sides exchange
  * once on the key; state per group is one carried row.
  */
object Joins {

  /** `left` gains `asofCols` (renamed with `prefix`) from the latest `right`
    * row per `keyCol` with right.`timeCol` <= left.`timeCol`.
    * `right` must be unique per (key, time) — pre-aggregate if not, or the
    * carried value at a tied timestamp is undefined. */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      asofCols: Seq[String], prefix: String = "asof_"): DataFrame = {
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

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = asofCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"$prefix$c",
        last(col(s"$prefix$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++
        asofCols.map(c => col(s"$prefix$c")): _*)
  }
}
