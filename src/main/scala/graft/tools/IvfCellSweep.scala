package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{IvfRelational, Similarity}

/** Dev tool: the round-9 closing measurement for the relation-bank IVF —
  * does "cells ∝ corpus, constant probe FRACTION" actually restore the
  * recall the r8 sf1 probe measured rotting (0.98 → 0.84 with cells
  * pinned at 128)?
  *
  * At each (nCells, nProbe) point it trains a relation bank
  * ([[IvfRelational.trainBank]] — no per-round driver pull, so cell
  * counts that would drown the driver-bank path are reachable) and
  * reports recall@k vs brute force plus wall time. The headline comparison:
  *   - 128 cells / 48 probes  = the shipped p76 config at 10× occupancy
  *   - 1280 cells / 480 probes = same probe fraction (37.5%), occupancy
  *     restored to the sf0.1 level (~39 vectors/cell)
  *
  * Usage: runMain graft.tools.IvfCellSweep [dir] [k]
  */
object IvfCellSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/sf1")
    val k = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("ivfcellsweep").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val qs = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(qs, emb, k = k)
      .select("query_id", "neighbor_id").localCheckpoint(true)
    val total = exact.count()
    println(s"corpus=$n vectors, k=$k, ${total} exact pairs")

    def sweep(tag: String, trainCorpus: org.apache.spark.sql.DataFrame,
        stride: Int, points: Seq[(Int, Int)]): Unit =
      points.foreach { case (nCells, nProbe) =>
        val t0 = System.nanoTime()
        val bank = IvfRelational.trainBank(trainCorpus, nCells = nCells,
          stride = stride)
        val tTrain = (System.nanoTime() - t0) / 1e9
        val nTrained = bank.count()
        val t1 = System.nanoTime()
        val ann = IvfRelational.topK(qs, emb, bank, k = k, nProbe = nProbe)
        val hits = ann.select("query_id", "neighbor_id")
          .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
        val tProbe = (System.nanoTime() - t1) / 1e9
        println(f"CELLSWEEP[$tag] cells=$nCells%4d (trained=$nTrained%4d) " +
          f"probes=$nProbe%4d occupancy=${n.toDouble / nTrained}%6.1f " +
          f"recall=${hits.toDouble / total}%.3f train=$tTrain%6.2fs " +
          f"probe=$tProbe%6.2fs")
      }

    sweep("full", emb, 15,
      Seq((128, 48), (256, 96), (512, 192), (1280, 480)))
    // the scaladoc remedy, measured: train the SAME cell counts on a
    // deterministic 25% sample (bank quality needs a representative
    // sample; per-round training cost drops ∝ sample), probe the full
    // corpus. stride shrinks with the sample so the seed still spans it.
    sweep("25%", emb.filter(col("vec_id") % 4 === 0), 3,
      Seq((512, 192), (1280, 480)))
    spark.stop()
  }
}
