package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev tool: recall/time of radius-1 vs radius-2 multi-probe LSH. */
object LshRadius {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val qs = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(qs, emb, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (radius <- Seq(1, 2)) {
      val t0 = System.nanoTime()
      val got = Similarity.lshTopK(qs, emb, k = 5, dim = 64, tables = 8,
          bits = 6, multiProbe = true, probeRadius = radius)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"radius=$radius recall=${(exact & got).size.toDouble / exact.size}%.2f time=$dt%.2fs")
    }
    spark.stop()
  }
}
