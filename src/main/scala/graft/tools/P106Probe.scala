package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Curation, IvfRelational, Similarity}
import graft.sources.Tables

/** Dev probe for the p106 sampled-training configuration: recall of the
  * 128-cell relation bank at sf0.1 under (training set × seed stride ×
  * nProbe) variants — separates sampling starvation from seeding effects
  * before pinning the registry parameters. */
object P106Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
    val qs = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(qs, emb, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(train: org.apache.spark.sql.DataFrame, stride: Int,
        nProbe: Int): Double = {
      val bank = IvfRelational.trainBank(train, nCells = 128, iters = 3,
        stride = stride)
      val ann = IvfRelational.topK(qs, emb, bank, k = 5, nProbe = nProbe)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (ann & exact).size.toDouble / exact.size
    }
    val n = emb.count()
    val sample = Curation.sampleUniform(emb, "vec_id",
      math.floor(10000.0 * math.min(1.0, 1024.0 / n)) / 10000.0)
    val half = Curation.sampleUniform(emb, "vec_id", 0.5)
    for ((name, tr) <- Seq("full" -> emb, "budget1024" -> sample,
        "half" -> half);
        stride <- Seq(3, 7);
        np <- Seq(48, 64))
      println(f"$name%-10s stride=$stride np=$np recall=${recall(tr, stride, np)}%.2f")
    spark.stop()
  }
}
