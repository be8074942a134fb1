package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key sequential time-series folds — the recursive computations
  * (EWMA and kin) that no window frame expresses because each output
  * depends on the previous OUTPUT, not a previous input range.
  *
  * Reference context: the reference's per-key reduce is an arbitrary
  * sequential fold over a key's values (nikiwiles/FSharp-MapReduce
  * Worker.fs:89-96 folds each shuffled pair into the worker's
  * accumulated partial state in arrival order); this is the same shape
  * with a time-ordered, non-commutative combiner.
  *
  * Scale design: each key's timeline folds independently after one
  * shuffle on the key — the parallelism unit is the key, exactly like
  * any `groupBy`, and a 100 TB corpus with millions of keys saturates
  * every executor. The fold itself runs inside Catalyst's
  * `aggregate` higher-order function on a per-key array, so per-key
  * state must be bounded (user/session/instrument timelines are; for
  * unbounded single-key streams, chunk by calendar window first and
  * chain the seeds). No driver collection, no UDF — the lambda is
  * codegen'd expression arithmetic.
  */
object TimeSeries {

  /** Exponential moving average per key: s_1 = v_1,
    * s_t = alpha*v_t + (1-alpha)*s_{t-1}, values ordered by
    * (`tsCol`, `tieCol`). IEEE evaluation order is fixed —
    * `(alpha*v) + (beta*acc)`, left fold — so a DuckDB
    * `list_reduce` over a `list(... ORDER BY ts, tie)` replays the
    * result bit-for-bit (the p81 query's oracle does).
    *
    * `alpha` should be an exactly-representable binary fraction
    * (0.125, 0.25, ...) so `1 - alpha` is exact too.
    *
    * Returns keyCols + (n_events, ewma), one row per key with at least
    * one non-null value. */
  def ewmaByKey(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, valCol: String, alpha: Double): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val key: Seq[Column] = keyCols.map(col)
    df.filter(col(valCol).isNotNull && keyCols.map(col(_).isNotNull)
        .reduce(_ && _))
      .groupBy(key: _*)
      .agg(collect_list(struct(col(tsCol).as("t"), col(tieCol).as("i"),
        col(valCol).cast("double").as("v"))).as("__evs"))
      .withColumn("__vs", expr("transform(array_sort(__evs), s -> s.v)"))
      .select(key ++ Seq(
        size(col("__vs")).cast("long").as("n_events"),
        expr(ewmaFoldSql(alpha)).as("ewma")): _*)
  }

  /** The EWMA fold as a SQL expression over a time-ordered `__vs`
    * DOUBLE-array column — the codegen'd `aggregate` lambda shared by
    * [[ewmaByKey]] and its chained-seed streaming sibling
    * ([[graft.streaming.EwmaStream]]). With `seedSql` the accumulator
    * starts from a carried state instead of the first value — the
    * chunk-and-chain pattern for unbounded single-key streams documented
    * above: because the fold is a left fold, seeding a chunk with the
    * previous chunk's result replays the identical IEEE operation
    * sequence as one fold over the concatenation — bit-for-bit. */
  def ewmaFoldSql(alpha: Double, vsCol: String = "__vs",
      seedSql: Option[String] = None): String = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val beta = 1.0 - alpha
    val lam = s"(acc, v) -> (CAST($alpha AS DOUBLE) * v)" +
      s" + (CAST($beta AS DOUBLE) * acc)"
    seedSql match {
      case Some(seed) => s"aggregate($vsCol, CAST($seed AS DOUBLE), $lam)"
      case None =>
        s"aggregate(slice($vsCol, 2, size($vsCol) - 1), $vsCol[0], $lam)"
    }
  }

  /** Funnel progression per key: how far through `steps` (an ordered
    * event-type sequence) each key's time-ordered events advance, as a
    * subsequence match — step i+1 counts only if it appears AFTER the
    * event that completed step i ((`tsCol`, `tieCol`) order; one event
    * advances at most one step). The same integer fold shape as
    * [[ewmaByKey]]: each type maps to its 1-based step index (0
    * otherwise) and the fold takes `acc -> acc + 1` exactly when the
    * element equals `acc + 1` — pure integer arithmetic, replayed
    * verbatim by a DuckDB `list_reduce` (the p83 oracle).
    *
    * Returns keyCols + (stage INT): 0 = never did steps.head, up to
    * steps.size = completed the funnel. */
  def funnelStage(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, typeCol: String, steps: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val key: Seq[Column] = keyCols.map(col)
    df.filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(key: _*)
      .agg(collect_list(struct(col(tsCol).as("t"), col(tieCol).as("i"),
        col(typeCol).as("ty"))).as("__evs"))
      .select(key :+ expr(funnelFoldSql(steps, seedSql = "0"))
        .as("stage"): _*)
  }

  /** The funnel fold as SQL over a collected `__evs` array of
    * (t, i, ty) structs: sort by (t, i), map each type to its 1-based
    * step index (0 otherwise), advance `acc -> acc + 1` exactly on
    * `acc + 1`. `seedSql` is the starting stage expression — `0` for
    * the batch operator, a carried-state column for the streaming
    * sibling ([[graft.streaming.FunnelStream]]); sharing the builder
    * keeps the two folds definitionally identical. */
  private[graft] def funnelFoldSql(steps: Seq[String],
      seedSql: String): String = {
    require(steps.nonEmpty && steps.distinct == steps, "steps must be distinct")
    require(steps.forall(s => !s.contains("'")), "step names must be quote-free")
    val stepCase = steps.zipWithIndex
      .map { case (s, i) => s"WHEN '$s' THEN ${i + 1}" }
      .mkString("CASE e.ty ", " ", " ELSE 0 END")
    s"""aggregate(
       |  transform(array_sort(__evs), e -> $stepCase),
       |  $seedSql, (acc, v) -> IF(v = acc + 1, acc + 1, acc))""".stripMargin
  }
}
