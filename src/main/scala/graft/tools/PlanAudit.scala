package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the plan-shape facts the scaladoc claims for the newest
  * queries (q33 decorrelation, p35 anti-join form) — the same audit a plan
  * reviewer performs by hand. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")

    val q33 = graft.queries.Relational.queries("q33_correlated_subquery")(spark, dir)
    q33.collect()
    val q33Plan = q33.queryExecution.executedPlan.toString
    println("q33 joins: " + "Join".r.findAllIn(q33Plan).length +
      " | hashAggs: " + "HashAggregate".r.findAllIn(q33Plan).length +
      " | sortMerge: " + q33Plan.contains("SortMergeJoin") +
      " | rowLevelSubquery: " + q33Plan.contains("InSubquery"))

    val p35 = graft.queries.Pipeline.queries("p35_dedup_incremental")(spark, dir)
    p35.collect()
    val p35Plan = p35.queryExecution.executedPlan.toString
    println("p35 antiJoins: " + "LeftAnti".r.findAllIn(p35Plan).length +
      " | broadcast: " + p35Plan.contains("BroadcastHashJoin") +
      " | sortMerge: " + p35Plan.contains("SortMergeJoin"))
    spark.stop()
  }
}
