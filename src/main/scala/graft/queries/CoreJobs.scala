package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.core.MapReduceJob
import graft.sources.Tables

/** Queries that run through the [[graft.core.MapReduceJob]] facade — the
  * reference's own programming model (source → flatMap KV → shuffle → fold →
  * merge) — rather than through Column expressions. Kept to low-volume shapes:
  * typed closures are opaque to Catalyst (SURVEY.md §4 caveat), so the
  * engine's primary path is `Relational`/`Pipeline`; this proves slot-level
  * parity with the reference API.
  */
object CoreJobs {

  /** The reference example job's exact shape — a frequency count keyed by a
    * low-cardinality column (`/root/reference/Example-Job.fs:52-61` counts
    * "Win"/"Lose"; here the key is l_returnflag). One KV pair per record, fold
    * is `+`, exactly the reference's reduce fn — but Spark plans a map-side
    * partial sum, so only 3 keys × n_partitions rows cross the shuffle
    * (the reference shipped every pair raw, `/root/reference/Worker.fs:81`). */
  def mapReduceFlagCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val job = MapReduceJob[String, String, Long](
      source = s => Tables.lineitem(s, dir).select("l_returnflag").as[String],
      mapFn = flag => Seq(flag -> 1L),
      reduceFn = _ + _)
    job.run(spark).toDF("l_returnflag", "n").orderBy("l_returnflag")
  }

  val mapReduceFlagCountsSql: String =
    """SELECT l_returnflag, COUNT(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** Faithful port of the reference's single shipped job — the dice-roll
    * win/lose frequency count (`/root/reference/Example-Job.fs`). Differences,
    * per SURVEY.md §5/FIXTURES.md: the unseeded `System.Random` stream
    * (`Example-Job.fs:37,40`) becomes a deterministic LCG over
    * `spark.range`, so the oracle can reproduce it exactly; we keep the
    * code's actual win condition `roll = 3` (`Example-Job.fs:52-53` — its
    * comment says "Win if 6" but the code tests 3). Arithmetic stays within
    * int range so DuckDB (which errors on BIGINT overflow rather than
    * wrapping) computes the identical stream. */
  def mapReduceDice(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val n = 100000L
    val job = MapReduceJob[Long, String, Long](
      source = s => {
        import s.implicits._
        s.range(n).select(
          (((col("id") * 48271L + 11L) % 2147483647L) % 6L + 1L).as("roll"))
          .as[Long]
      },
      mapFn = roll => Seq((if (roll == 3L) "Win" else "Lose") -> 1L),
      reduceFn = _ + _)
    job.run(spark).toDF("outcome", "n").orderBy("outcome")
  }

  val mapReduceDiceSql: String =
    """SELECT CASE WHEN (i * 48271 + 11) % 2147483647 % 6 + 1 = 3
      |            THEN 'Win' ELSE 'Lose' END AS outcome,
      |  COUNT(*) AS n
      |FROM range(100000) t(i)
      |GROUP BY 1
      |ORDER BY outcome""".stripMargin

  /** Typed cogroup — the per-key two-sided custom merge the reference's
    * model cannot express at all (its shuffle carries ONE KV stream;
    * `Worker.fs:89-96` folds a single dictionary). Spark's
    * `KeyValueGroupedDataset.cogroup` hands a user function both sides of
    * a key in one pass. Kept to counts (exact ints) so the DuckDB oracle —
    * a conditional aggregation producing the identical per-user view — can
    * hash-match the opaque-closure path. */
  def cogroupUserActivity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id").as[Long]).groupByKey(identity(_))
    side("view").cogroup(side("purchase")) { (user, vs, ps) =>
      Iterator((user, vs.size.toLong, ps.size.toLong))
    }.toDF("user_id", "n_views", "n_purchases").orderBy("user_id")
  }

  val cogroupUserActivitySql: String =
    """SELECT user_id,
      |  CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT)
      |    AS n_views,
      |  CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
      |    AS n_purchases
      |FROM events
      |WHERE event_type IN ('view', 'purchase')
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** q47 — the dice job read through the DataSource V2 paginated source
    * ([[graft.sources.v2.PagedRollSource]]): the reference Loader's
    * cursor-paged protocol as a real Spark connector, one InputPartition
    * per page, column pruning pushed into the source (only `roll` is ever
    * materialized). Shares q18's oracle: the source must reproduce the
    * exact LCG stream the SQL replays. */
  def pagedSourceDice(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit, when}
    spark.read.format("graft.sources.v2.PagedRollSource")
      .option("rows", "100000").option("pageSize", "4096").load()
      .select(when(col("roll") === 3L, "Win").otherwise("Lose").as("outcome"))
      .groupBy(col("outcome")).agg(count(lit(1)).as("n"))
      .orderBy("outcome")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_mapreduce_flag_counts" -> (mapReduceFlagCounts _),
    "q18_mapreduce_dice" -> (mapReduceDice _),
    "q41_cogroup" -> (cogroupUserActivity _),
    "q47_paged_source" -> (pagedSourceDice _))

  val oracleSql: Map[String, String] = Map(
    "q17_mapreduce_flag_counts" -> mapReduceFlagCountsSql,
    "q18_mapreduce_dice" -> mapReduceDiceSql,
    "q41_cogroup" -> cogroupUserActivitySql,
    "q47_paged_source" -> mapReduceDiceSql)
}
