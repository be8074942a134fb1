package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run an ad-hoc SQL string against a bare session (feature
  * probes — e.g. "does this Spark build parse WITH RECURSIVE?"). */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { sql =>
      println(s"\n== $sql")
      try spark.sql(sql).show(20, truncate = false)
      catch { case e: Throwable =>
        println("PROBE-FAIL: " + e.toString.take(300))
      }
    }
    spark.stop()
  }
}
