package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Dev tool: recall/cost sweep for embeddingNearDupPairs probe parameters.
  * Ground truth = exact seed-restricted pairs (vec_id < 50, cosine ≥ 0.4),
  * the p36 contract. */
object EmbPairSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions.cosine

    val emb = Tables.embeddings(spark, dir).localCheckpoint(true)
    val exact = broadcast(emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("seed"), col("embedding").as("v_s")))
      .join(emb.select(col("vec_id").as("other"), col("embedding").as("v_o")),
        col("seed") =!= col("other"))
      .filter(cosine(col("v_s"), col("v_o")) >= 0.4)
      .select(least(col("seed"), col("other")).as("id_a"),
        greatest(col("seed"), col("other")).as("id_b"))
      .distinct().localCheckpoint(true)
    val total = exact.count()
    println(s"[sweep] exact seed pairs: $total")

    for ((t, b, r) <- Seq((8, 8, 0), (8, 8, 1), (8, 8, 2), (8, 10, 2),
                          (8, 12, 2), (16, 10, 2))) {
      val t0 = System.nanoTime()
      val found = Similarity.embeddingNearDupPairs(emb, threshold = 0.4,
        dim = 64, tables = t, bits = b, probeRadius = r)
      val n = found.count()
      val hits = found.select(col("id_a"), col("id_b"))
        .join(exact, Seq("id_a", "id_b"), "left_semi").count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] tables=$t bits=$b r=$r pairs=$n hits=$hits/$total recall=${hits.toDouble / total}%.2f time=$dt%.2fs")
    }
    spark.stop()
  }
}
