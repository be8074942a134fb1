package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (guide §1): decompose the PER-ACTION fixed cost the r17
  * profiles blamed for the lifecycle queries' seconds (~40 ms/job across
  * hundreds of driver-sequential actions). Three hypotheses, measured
  * head-to-head on a representative store-verb-shaped plan:
  *
  *   A. varying `lit(batchId)` per action  → Janino cache miss per stage
  *   B. [[graft.functions.SteadyLit]] ref  → same plan, stable codegen src
  *   C. fixed literal                      → codegen cache always hits
  *   D. parquet read per action with vs without explicit schema
  *      (footer-based schema inference is driver work per `read.parquet`)
  *
  * Usage: sbt "runMain graft.tools.PlanTax <sfDir>"
  */
object PlanTax {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("plantax").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.SteadyLit.steadyLong

    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 500)
      .localCheckpoint(true)

    def shaped(v: org.apache.spark.sql.Column) = docs
      .groupBy((col("doc_id") % 7).as("k"))
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("len"))
      .select(col("k"), col("n"), col("len"), v.as("__v"))

    def time(label: String)(body: Int => Unit): Unit = {
      body(0) // warm
      val n = 30
      val t0 = System.nanoTime()
      (1 to n).foreach(body)
      val ms = (System.nanoTime() - t0) / 1e6 / n
      println(f"[plantax] $label%-34s ${ms}%8.1f ms/action")
    }

    time("A varying lit(i)") { i =>
      shaped(lit(i.toLong)).write.format("noop").mode("overwrite").save() }
    time("B varying steadyLong(i)") { i =>
      shaped(steadyLong(i.toLong)).write.format("noop").mode("overwrite").save() }
    time("C fixed lit(42)") { _ =>
      shaped(lit(42L)).write.format("noop").mode("overwrite").save() }

    // D: per-action parquet read (schema inference vs explicit schema)
    val tmp = java.nio.file.Files.createTempDirectory("plantax_").toString
    docs.write.parquet(s"$tmp/v0")
    val schema = spark.read.parquet(s"$tmp/v0").schema
    time("D1 read.parquet inferred") { i =>
      spark.read.parquet(s"$tmp/v0").select(col("doc_id"), lit(i).as("b"))
        .write.format("noop").mode("overwrite").save() }
    time("D2 read.parquet explicit schema") { i =>
      spark.read.schema(schema).parquet(s"$tmp/v0")
        .select(col("doc_id"), lit(i).as("b"))
        .write.format("noop").mode("overwrite").save() }
    time("D3 read explicit + steady") { i =>
      spark.read.schema(schema).parquet(s"$tmp/v0")
        .select(col("doc_id"), steadyLong(i.toLong).as("b"))
        .write.format("noop").mode("overwrite").save() }

    spark.stop()
  }
}
