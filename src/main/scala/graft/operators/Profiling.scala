package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Column profiling: per-column statistics (row count, nulls, distinct
  * count, min/max) for a selected set of numeric-castable columns — the
  * data-quality sweep a pipeline runs before committing a snapshot to
  * training.
  *
  * Reference context: the reference's only built-in analytics are the
  * word-count/dice jobs (nikiwiles/FSharp-MapReduce Example-Job.fs:31-86);
  * profiling is the same per-key fold generalized to dataset metadata.
  *
  * Scale design: ONE aggregation pass produces every metric as a single
  * row (partial + final aggregate; Spark plans the N exact distinct counts
  * via one Expand — rows multiply by #cols on the map side but only
  * distinct values reach the exchange), then the row unpivots driver-free
  * into one row per column. `exact=false` swaps the distinct counts for
  * HyperLogLog sketches (`approx_count_distinct`), the 100 TB default —
  * same single-pass shape without the Expand blowup.
  */
object Profiling {

  /** Profile `cols` of `df`. Values are surfaced as DOUBLE (uniform output
    * schema across int/bigint/double inputs; exact for 2^53-bounded
    * integers). Output: (column_name, n_rows, n_nulls, n_distinct,
    * min_value, max_value), one row per profiled column. */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true)
      : DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val ndv: String => org.apache.spark.sql.Column =
      if (exact) c => count_distinct(col(c))
      else c => approx_count_distinct(col(c))
    val aggs = count(lit(1)).as("__n_rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        ndv(c).as(s"__ndv_$c"),
        min(col(c).cast(DoubleType)).as(s"__min_$c"),
        max(col(c).cast(DoubleType)).as(s"__max_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col("__n_rows").as("n_rows"),
        (col("__n_rows") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__ndv_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("__p"))
      .select(col("__p.*"))
      .orderBy("column_name")
  }

  /** Equi-width histogram of a numeric-castable column: two passes (a
    * min/max aggregate broadcast into a binning scan + partial/final
    * count), never a driver-side value pull. The last bin is closed
    * (`x = max` clamps into bin `bins-1`); empty bins are absent. The
    * binning arithmetic is plain IEEE doubles over exactly-derived
    * bounds — association order mirrored by the SQL oracle.
    *
    * Returns (bin, bin_lo, bin_hi, n) ordered by bin. */
  def histogram(df: DataFrame, colName: String, bins: Int): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val x = col(colName).cast(DoubleType)
    val mm = df.agg(min(x).as("__mn"), max(x).as("__mx"))
    val width = (col("__mx") - col("__mn")) / lit(bins.toDouble)
    val bin = when(col("__mx") === col("__mn"), lit(0))
      .otherwise(least(floor((col("__x") - col("__mn")) / width),
        lit((bins - 1).toDouble)).cast("int"))
    df.select(x.as("__x")).filter(col("__x").isNotNull)
      .crossJoin(broadcast(mm))
      .select(bin.as("bin"), col("__mn"), col("__mx"))
      .groupBy(col("bin"), col("__mn"), col("__mx"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (col("__mn") + (col("bin").cast(DoubleType) * width)).as("bin_lo"),
        (col("__mn") + ((col("bin") + 1).cast(DoubleType) * width))
          .as("bin_hi"),
        col("n"))
      .orderBy("bin")
  }

  /** Piggyback data-quality metrics on whatever action the caller runs
    * next: row count and per-column null counts collected through
    * `Dataset.observe` — ZERO extra scans (metrics accumulate inside the
    * existing job's tasks), vs [[profile]]'s dedicated aggregation pass.
    * The pipeline-monitoring primitive for 100 TB jobs where a second
    * pass over the input is unaffordable.
    *
    * Returns the instrumented frame (plan unchanged otherwise) and the
    * [[org.apache.spark.sql.Observation]]; call `observation.get` after
    * an action completes. Keys: `rows`, and `nulls_<col>` per column. */
  def withObservedStats(df: DataFrame, name: String, cols: Seq[String])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    val metrics = count(lit(1)).as("rows") +:
      cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L))
        .as(s"nulls_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
