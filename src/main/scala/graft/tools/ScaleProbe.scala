package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: the VERDICT r7 #4 scale probe. Runs the heavy dedup/ANN
  * family once per scale on sf0.1 and the locally generated sf1
  * ([[Sf1Gen]]), recording wall time per query — a survives-10×-scale-up
  * check, not an oracle run (hash-checking at sf1 is overkill; sf0.01/0.1
  * already pin correctness). Recall-gate queries (p76/p87) also print
  * their recall rows so bank quality at sf1 is driver-visible.
  *
  * Usage: runMain graft.tools.ScaleProbe [sf1Dir] [queries,csv]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("target/sf1")
    val names = (if (args.length > 1) args(1).split(',').toSeq
      else Seq("p08_dedup_minhash", "p85_jaccard_join", "p94_containment_join",
        "p76_ivf_recall_scaled", "p87_ivfpq_recall_scaled",
        "p69_curation_semantic")).map(_.trim)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("scaleprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val rows = names.map { n =>
      val t01 = time(n, "/root/testdata/sf0.1")       // also the warmup
      val t01b = time(n, "/root/testdata/sf0.1")       // warmed reading
      val t1cold = time(n, sf1)                        // includes model fits
      val t1 = time(n, sf1)                            // steady state
      val recall =
        if (n.contains("recall")) {
          val r = SparkEntry.queries(n)(spark, sf1).collect().head
          f"${r.getAs[Double]("recall")}%.2f"
        } else "-"
      println(f"PROBE $n%-26s sf0.1=$t01b%7.2fs sf1cold=$t1cold%7.2fs " +
        f"sf1=$t1%7.2fs ratio=${t1 / t01b}%5.2fx recall=$recall")
      (n, t01b, t1cold, t1, recall)
    }
    println("| query | sf0.1 s | sf1 cold s | sf1 s | ratio | sf1 recall |")
    println("|---|---|---|---|---|---|")
    rows.foreach { case (n, a, c, b, r) =>
      println(f"| $n | $a%.2f | $c%.2f | $b%.2f | ${b / a}%.2f× | $r |")
    }
    spark.stop()
  }
}
