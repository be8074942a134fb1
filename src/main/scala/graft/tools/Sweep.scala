package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Ad-hoc ANN parameter sweep at sf0.01 (dev tool). */
object Sweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01").cache()
    val n = emb.count()
    val qs = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(qs, emb, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val cand = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      ((cand.toSet & exact).size.toDouble / exact.size, cand.length.toLong)
    }
    println(s"corpus=$n")
    for (t <- Seq(8, 16); b <- Seq(4, 6, 8); mp <- Seq(false, true)) {
      val (r, c) = recall(Similarity.lshTopK(qs, emb, 5, 64, t, b, multiProbe = mp))
      println(f"LSH tables=$t bits=$b mp=$mp recall=$r%.2f cand=$c")
    }
    for (cells <- Seq(16, 32); probe <- Seq(4, 8)) {
      val (r, _) = recall(Similarity.ivfTopK(qs, emb, 5, cells, probe))
      println(f"IVF cells=$cells probe=$probe recall=$r%.2f")
    }
    spark.stop()
  }
}
