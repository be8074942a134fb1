package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions, TextFunctions => TF}
import graft.sources.Tables

/** Dev tool: stage-by-stage timing of the hot pipeline operators. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dir)
    time("docs count")(docs.count())

    val shingles = array_distinct(TF.tokenShingles(TF.tokens(col("text")), 3))
    val shingleTable = docs.select(col("doc_id").as("id"), shingles.as("sh"))
    time("tokenize+shingle")(shingleTable.select(sum(size(col("sh")))).collect())
    time("tokenize+shingle again")(shingleTable.select(sum(size(col("sh")))).collect())

    val sig = shingleTable.select(col("id"),
      HashFunctions.minhashSignature(col("sh"), 64, 42L).as("sig"))
    time("minhash sigs")(sig.select(sum(size(col("sig")))).collect())

    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(slice(col("sig"), b * 4 + 1, lit(4)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    time("banded count")(banded.count())

    val pairs = graft.operators.Dedup.minhashPairs(docs, "doc_id", "text",
      64, 16, 3, 0.4)
    time("full minhashPairs")(pairs.count())
    spark.stop()
  }
}
