package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Similarity
import graft.sources.Tables

/** Dev tool: dump the trained IVF centroid bank and PQ codebooks for a
  * scale-factor dir as JSON (oracle-replay debugging). */
object BankDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    val ivf = Similarity.ivfCentroidsTrained(emb, nCells = 16)
    val pq = Similarity.pqTrain(emb)
    def arr1(a: Array[Double]) = a.map(d => s"\"$d\"").mkString("[", ",", "]")
    def arr2(a: Array[Array[Double]]) = a.map(arr1).mkString("[", ",", "]")
    def arr3(a: Array[Array[Array[Double]]]) = a.map(arr2).mkString("[", ",", "]")
    val json = s"""{"ivf": ${arr2(ivf)}, "pq": ${arr3(pq)}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
