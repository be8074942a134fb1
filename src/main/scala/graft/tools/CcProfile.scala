package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.queries.Pipeline

/** Dev tool: where does p24 (near-dup clusters) spend its time at a given
  * SF — edge derivation (tokenize/shingle/jaccard) vs the iterative CC
  * loop — and how many contraction rounds does each CC variant take. */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val edgesPlan = Pipeline.p07NgramJaccard(spark, dir)
      .filter(col("jaccard") >= 0.05)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
    val edges = time("edge derivation (materialize)")(edgesPlan.localCheckpoint(true))
    val n = edges.count()
    println(s"[cc] edges: $n")

    (1 to 2).foreach { pass =>
      val (lbl, rounds) = time(s"starWithRounds pass$pass")(
        Dedup.starWithRounds(edges, 30))
      val k = time(s"  star labels->clusters pass$pass")(
        lbl.groupBy("component").count().count())
      println(s"[cc] star rounds=$rounds clusters=$k")
    }
    (1 to 2).foreach { pass =>
      val (lbl, rounds) = time(s"propagationWithRounds pass$pass")(
        Dedup.propagationWithRounds(edges, 100))
      val k = time(s"  prop labels->clusters pass$pass")(
        lbl.groupBy("component").count().count())
      println(s"[cc] prop rounds=$rounds clusters=$k")
    }
    spark.stop()
  }
}
