package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling: salted two-phase aggregation.
  *
  * The reference's shipped example is the pathological case — millions of
  * records folding into 2 keys, each key pinned to one worker by consistent
  * hashing with every record crossing the wire
  * (`/root/reference/Example-Job.fs:53-54`, `/root/reference/Worker.fs:40,81`).
  * Spark's partial aggregation already collapses that per partition; salting
  * covers the residual case where even per-partition groups are too few to
  * spread load (or where AQE's skew handling doesn't apply, e.g. high-card
  * aggregation with a few whales).
  *
  * Phase 1 groups by (key, salt) — spreading each hot key over `salts`
  * reducers — and computes algebraic partials; phase 2 re-groups by key and
  * merges. Correct for any commutative-associative aggregate expressed as
  * (partial, merge) pairs.
  */
object Skew {

  /** Salted count + sums. `sumCols` are summed exactly as given (pre-cast
    * them to DecimalType for float-exactness). The salt is derived from a
    * per-row id, so duplicates of one key spread evenly; results are
    * identical to a direct groupBy because the merge is associative. */
  def saltedCountSum(df: DataFrame, keys: Seq[String],
      sumCols: Map[String, Column], salts: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(count(lit(1)).as("__n"),
        sumCols.toSeq.map { case (n, c) => sum(c).as(s"__s_$n") }: _*)
    partial
      .groupBy(keyCols: _*)
      .agg(sum(col("__n")).as("n"),
        sumCols.keys.toSeq.map(n => sum(col(s"__s_$n")).as(n)): _*)
  }

  /** Salted repartition join for a skewed large side against a
    * replicable-but-not-broadcastable right side.
    *
    * When one join key holds a disproportionate share of the large side's
    * rows, a plain shuffled join sends that whole share to one reducer —
    * the straggler that decides the stage's wall clock at 100 TB. Salting
    * splits every key's rows across `salts` reducers: the large side gets a
    * per-row salt (derived from the row id, NOT the key, so a hot key's
    * rows spread evenly), the right side replicates each row `salts` times
    * via an explode (×`salts` rows, but only of the join payload — keep the
    * right side projected to what the query needs), and the join runs on
    * (keys..., salt). Result is row-identical to the unsalted join.
    *
    * Use when the right side is too large to broadcast but small enough to
    * replicate `salts`× through one exchange (dimension tables in the
    * 100 MB–10 GB band). Below that, broadcast; above, AQE skew-join
    * splitting. The shuffle-hash hint keeps Spark from sorting both sides:
    * replicated-right partitions stay hash-table-sized by construction. */
  def saltedJoin(large: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int = 16): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    val l = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r.hint("shuffle_hash"), keys :+ "__salt").drop("__salt")
  }
}
