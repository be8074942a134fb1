package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev tool: PQ / IVF-PQ recall as a function of the refine multiplier. */
object PqRefine {
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
    val banks = Similarity.pqTrain(emb, m = 16, nCodes = 32)
    val cents = Similarity.ivfCentroidsTrained(emb, nCells = 16)
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    for (refine <- Seq(16, 24, 32, 48)) {
      val rp = recall(Similarity.pqTopK(qs, emb, k = 5, banks, refine = refine))
      val ri = recall(Similarity.ivfPqTopK(qs, emb, k = 5, cents, banks,
        nProbe = 8, refine = refine))
      println(f"refine=$refine pq=$rp%.2f ivfpq=$ri%.2f")
    }
    spark.stop()
  }
}
