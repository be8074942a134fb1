package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Dev tool: stage-by-stage cost breakdown of the p76 IVF recall gate at a
  * given scale dir — attributes the ScaleProbe's super-linear sf1 reading
  * (22.8 s warm vs 1.32 s at sf0.1) to its components: bank training,
  * exact ground truth, ANN probe+verify, balance profile.
  *
  * Usage: runMain graft.tools.P76Profile [dir]
  */
object P76Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[p76] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, dir)
    time("emb count")(emb.count())

    val bank = time("bank train (128 cells, stride 15, 3 iters)")(
      Similarity.ivfCentroidsTrained(emb, nCells = 128, stride = 15))
    val qs = emb.filter(col("vec_id") < 10)

    val exact = time("exact bruteForceTopK(10 q)")(
      Similarity.bruteForceTopK(qs, emb, k = 5)
        .select("query_id", "neighbor_id").localCheckpoint(true))
    time("exact count")(exact.count())

    val ann = Similarity.ivfTopK(qs, emb, k = 5,
      nProbe = math.min(48, bank.length), centroids = Some(bank))
    time("ann probe+verify")(ann.write.format("noop").mode("overwrite").save())
    time("ann probe+verify again")(
      ann.write.format("noop").mode("overwrite").save())

    val balance = Similarity.ivfAssign(emb, bank)
      .groupBy(col("cell")).agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_cells"), max(col("sz")).as("max_cell"),
        sum(col("sz")).as("n_vecs"))
    time("balance profile")(balance.collect())

    time("full p76 query")(
      graft.SparkEntry.queries("p76_ivf_recall_scaled")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    time("full p76 query again")(
      graft.SparkEntry.queries("p76_ivf_recall_scaled")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
