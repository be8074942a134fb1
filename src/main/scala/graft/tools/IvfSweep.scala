package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev tool: recall-vs-nProbe sweep of the 128-cell IVF bank on a probe
  * directory (default the [[Sf1Gen]] sf1) — quantifies the VERDICT r7 #4
  * scale question for ANN: when cell occupancy grows 10×, how many probes
  * restore the shipped-scale recall, and what does each probe level cost?
  *
  * Usage: runMain graft.tools.IvfSweep [dir] [k]
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val k = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("ivfsweep").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 10)
    val bank = Similarity.ivfCentroidsTrained(emb, nCells = 128, stride = 15)
    val exact = Similarity.bruteForceTopK(qs, emb, k = k)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    val total = exact.count()
    Seq(16, 32, 48, 64, 96, 128).foreach { nProbe =>
      val t0 = System.nanoTime()
      val ann = Similarity.ivfTopK(qs, emb, k = k,
        nProbe = math.min(nProbe, bank.length), centroids = Some(bank))
      val hits = ann.select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SWEEP nProbe=$nProbe%3d recall=${hits.toDouble / total}%.3f " +
        f"time=$sec%.2fs")
    }
    spark.stop()
  }
}
