package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_mapreduce_flag_counts" -> (mapReduceFlagCounts _))

  val oracleSql: Map[String, String] = Map(
    "q17_mapreduce_flag_counts" -> mapReduceFlagCountsSql)
}
