package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink breadth: the reference's only source is one generic pull
  * loader (`/root/reference/Loader.fs`), its only sink an in-memory dict
  * callback. Here: parquet/csv/json round-trips and partitioned writes. */
class SourcesSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString

  test("all ten star-schema tables load with sane schemas") {
    Tables.names.foreach { n =>
      val df = Tables(spark, sfDir, n)
      assert(df.columns.nonEmpty, s"$n has no columns")
      assert(df.count() > 0, s"$n is empty")
    }
  }

  test("csv round-trip preserves rows and values") {
    val orig = Tables.nation(spark, sfDir)
    orig.write.mode("overwrite").option("header", "true")
      .csv(s"$tmp/nation_csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/nation_csv")
    assert(back.count() === orig.count())
    assert(back.select(sum("n_nationkey")).head().getLong(0) ===
      orig.select(sum("n_nationkey")).head().getLong(0))
  }

  test("json round-trip preserves rows and values") {
    val orig = Tables.region(spark, sfDir)
    orig.write.mode("overwrite").json(s"$tmp/region_json")
    val back = spark.read.json(s"$tmp/region_json")
    assert(back.count() === orig.count())
    assert(back.select(collect_set("r_name")).head().getSeq[String](0).toSet ===
      orig.select(collect_set("r_name")).head().getSeq[String](0).toSet)
  }

  test("partitioned parquet write prunes partitions on read") {
    Tables.orders(spark, sfDir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year")
      .parquet(s"$tmp/orders_part")
    val pruned = spark.read.parquet(s"$tmp/orders_part")
      .filter(col("o_year") === 1996)
    // partition pruning: only the 1996 directory is scanned
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0)
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("o_year"), s"no partition pruning:\n$plan")
  }
}
