package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev tool: CC loop cost on a synthetic chain graph, isolated from the
  * edge-derivation pipeline — measures pure per-round overhead. */
object CcMicro {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(600)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // chains of length 10: edges (i, i+1) except every 10th
    val pairs = spark.range(n).filter(col("id") % 10 =!= 9)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      .localCheckpoint(true)

    for (pass <- 1 to 3) {
      val t0 = System.nanoTime()
      val (lbl, rounds) = Dedup.starWithRounds(pairs, 30)
      val k = lbl.groupBy("component").count().count()
      println(f"[ccmicro] star pass$pass: ${(System.nanoTime() - t0) / 1e9}%.2fs rounds=$rounds clusters=$k")
    }
    for (pass <- 1 to 3) {
      val t0 = System.nanoTime()
      val (lbl, rounds) = Dedup.propagationWithRounds(pairs, 100)
      val k = lbl.groupBy("component").count().count()
      println(f"[ccmicro] prop pass$pass: ${(System.nanoTime() - t0) / 1e9}%.2fs rounds=$rounds clusters=$k")
    }
    spark.stop()
  }
}
