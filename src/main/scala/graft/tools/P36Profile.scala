package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => TF}
import graft.operators.Dedup
import graft.queries.Pipeline
import graft.sources.Tables

/** Dev tool: component timings for p36 (dedup recall audit) at a given SF —
  * which of the three candidate pipelines and two exact ground-truth sides
  * dominates. */
object P36Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions.cosine

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p36] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    time("p08 minhash")(Pipeline.p08DedupMinhash(spark, dir).count())
    time("p09 simhash")(Pipeline.p09DedupSimhash(spark, dir).count())
    time("p11 embed r2")(Pipeline.p11EmbedNearDup(spark, dir).count())

    val docs = Tables.documents(spark, dir)
    val sh = docs.select(col("doc_id"),
      array_distinct(TF.tokenShingles(TF.tokens(col("text")), 3)).as("sh"))
      .withColumn("sz", size(col("sh")))
    time("exactText explode+join")(
      broadcast(sh.filter(col("doc_id") < 50)
          .select(col("doc_id").as("seed"), col("sz").as("sz_s"),
            explode(col("sh")).as("g")))
        .join(sh.select(col("doc_id").as("other"), col("sz").as("sz_o"),
            explode(col("sh")).as("g")), "g")
        .filter(col("seed") =!= col("other"))
        .groupBy(col("seed"), col("other"), col("sz_s"), col("sz_o"))
        .agg(count(lit(1)).as("inter"))
        .filter(col("inter").cast("double") /
          (col("sz_s") + col("sz_o") - col("inter")).cast("double") >= 0.4)
        .count())
    val emb = Tables.embeddings(spark, dir)
    time("exactEmb seedx")(
      broadcast(emb.filter(col("vec_id") < 50)
          .select(col("vec_id").as("seed"), col("embedding").as("v_s")))
        .join(emb.select(col("vec_id").as("other"), col("embedding").as("v_o")),
          col("seed") =!= col("other"))
        .filter(cosine(col("v_s"), col("v_o")) >= 0.4)
        .count())
    (1 to 2).foreach { pass =>
      time(s"p36 full pass$pass")(Pipeline.p36DedupRecall(spark, dir).count())
    }
    spark.stop()
  }
}
