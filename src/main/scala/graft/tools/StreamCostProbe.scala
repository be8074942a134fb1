package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IvfRelational
import graft.sources.Tables
import graft.streaming.{IvfStream, RetrievalStream}

/** Dev tool: measures the incremental family's central 100 TB claim —
  * per-batch append cost is BATCH-sized, independent of how large the
  * standing store has grown. The claim is structural (appendBatch reads
  * only the frozen model + its own batch; it never scans the standing
  * deltas), but r10 makes it a measurement: the same fixed batch is
  * appended against standing stores 10× apart in size (sf0.1 vs the
  * [[Sf1Gen]] sf1), and the per-append wall times must be flat (ratio
  * ≈ 1×, not ≈ 10×).
  *
  * Probed stores: [[IvfStream]] (the data-sized index whose delta is
  * batch-sized — the interesting case) and [[RetrievalStream]] (posting
  * deltas — tokenizes only its own docs). The sketch stores (HLL /
  * count-min / moments / bin counts / bloom bits) append model-sized
  * deltas from a batch-sized scan by construction and would only
  * restate the same number.
  *
  * Usage: runMain graft.tools.StreamCostProbe [sf1Dir] [nAppends]
  */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("target/sf1")
    val nAppends = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("streamcostprobe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The fixed batch: the same 500 sf0.1 vectors / 200 sf0.1 docs at
    // every standing size, so any time difference is the standing store's.
    val batchVecs = Tables.embeddings(spark, "/root/testdata/sf0.1")
      .filter(col("vec_id") < 500).localCheckpoint(true)
    val batchDocs = Tables.documents(spark, "/root/testdata/sf0.1")
      .filter(col("doc_id") < 200).localCheckpoint(true)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def ivfAppends(dir: String, label: String): Seq[Double] = {
      val emb = Tables.embeddings(spark, dir)
      val root = Files.createTempDirectory(s"scp_ivf_$label").toString
      // Same 64-cell bank config at every scale: the bank is the frozen
      // model the batch assigns under; its size must not vary with the
      // standing corpus or the assign cost comparison is confounded.
      val bank = IvfRelational.trainBank(emb, nCells = 64, iters = 1)
        .localCheckpoint(true)
      val standing = timed {
        IvfStream.writeStanding(spark, s"$root/bank", s"$root/idx", emb, bank)
      }
      val times = (0L until nAppends.toLong).map { b =>
        timed {
          IvfStream.appendBatch(spark, s"$root/bank", s"$root/idx",
            s"$root/out", "vec_id", "embedding")(batchVecs, b)
        }
      }
      println(f"IVF   $label%-6s standing=$standing%6.2fs appends=" +
        times.map(t => f"$t%.2f").mkString("[", ", ", "]s"))
      times
    }

    def bm25Appends(dir: String, label: String): Seq[Double] = {
      val docs = Tables.documents(spark, dir)
      val root = Files.createTempDirectory(s"scp_bm_$label").toString
      val standing = timed {
        RetrievalStream.writeStanding(spark, root, docs, "doc_id", "text")
      }
      val times = (0L until nAppends.toLong).map { b =>
        timed {
          RetrievalStream.appendBatch(spark, root, "doc_id", "text")(
            batchDocs, b)
        }
      }
      println(f"BM25  $label%-6s standing=$standing%6.2fs appends=" +
        times.map(t => f"$t%.2f").mkString("[", ", ", "]s"))
      times
    }

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val i01 = ivfAppends("/root/testdata/sf0.1", "sf0.1")
    val i1 = ivfAppends(sf1, "sf1")
    val b01 = bm25Appends("/root/testdata/sf0.1", "sf0.1")
    val b1 = bm25Appends(sf1, "sf1")

    println("| store | batch | sf0.1 append s | sf1 append s | ratio |")
    println("|---|---|---|---|---|")
    println(f"| IvfStream | 500 vecs | ${med(i01)}%.2f | ${med(i1)}%.2f " +
      f"| ${med(i1) / med(i01)}%.2f× |")
    println(f"| RetrievalStream | 200 docs | ${med(b01)}%.2f | ${med(b1)}%.2f " +
      f"| ${med(b1) / med(b01)}%.2f× |")
    spark.stop()
  }
}
