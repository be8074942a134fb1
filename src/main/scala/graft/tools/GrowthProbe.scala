package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: cost-growth attribution for the exact-join family. Runs each
  * query at several scale dirs recording wall time AND output rows — the
  * question the ScaleProbe timings alone can't answer: is super-linear
  * time an algorithmic failure, or is the RESULT itself growing
  * super-linearly (a dense-vocabulary corpus densifies: with the shipped
  * 31-word vocabulary, every doc added shares shingles with every
  * existing doc, so qualifying pairs — the output — grow ~quadratically,
  * and no exact algorithm can beat its own output size).
  *
  * Usage: runMain graft.tools.GrowthProbe [queries,csv] [dir1] [dir2] ...
  */
object GrowthProbe {
  def main(args: Array[String]): Unit = {
    val names = (if (args.nonEmpty) args(0).split(',').toSeq
      else Seq("p85_jaccard_join", "p94_containment_join")).map(_.trim)
    val dirs = if (args.length > 1) args.drop(1).toSeq
      else Seq("/root/testdata/sf0.1", "target/sf03", "target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("growthprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("| query | dir | rows | sec |")
    println("|---|---|---|---|")
    for (n <- names; d <- dirs) {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, d).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"| $n | $d | $rows | $sec%.2f |")
    }
    spark.stop()
  }
}
