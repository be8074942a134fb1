package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, IvfRelational, Similarity}

/** Vector-side REALISM recall audit — the r11 VERDICT #3 probe, the
  * embedding analogue of [[ZipfRecallProbe]]. Every shipped vector recall
  * number was measured on Sf1Gen's centroid-fitted synthetic vectors
  * (10 equal, balanced clusters); real embedding corpora are ANISOTROPIC
  * with HEAVY-TAILED cluster sizes — the configuration where hyperplane
  * LSH and fixed-stride IVF seeding degrade. This measures, on the
  * `Sf1Gen ... aniso` fixture (64 Zipf(1.2)-sized clusters, per-dim
  * σ ∝ (d+1)^-0.7) at 1× and 10×:
  *
  *   - LSH multi-probe top-k at the p10 registry config
  *   - relation-bank IVF at the p76/p103 registry config (128 cells,
  *     stride 15, nProbe 48) + the trained bank's cell balance
  *   - sample-trained IVF at the p106 registry config (frac =
  *     min(1, 1024/n), stride 3, nProbe 64)
  *   - the two remedies, if recall rots: nProbe doubled, and
  *     cells ∝ corpus (256 cells at 10×, the SCALING.md prescription)
  *
  * recall@5 over 100 queries vs the exact brute-force top-5.
  * Usage: runMain graft.tools.VecRecallProbe [dir ...]
  */
object VecRecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("target/aniso01", "target/aniso1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("vec-recall-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("| corpus | family | config | recall@5 | hits/total | " +
      "cells (nonempty) | max/mean occupancy |")
    println("|---|---|---|---|---|---|---|")
    for (dir <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .localCheckpoint(true)
      val n = emb.count()
      val qs = emb.filter(col("vec_id") < 100).localCheckpoint(true)
      val exact = Similarity.bruteForceTopK(qs, emb, k = 5)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true)
      val total = exact.count()

      def row(family: String, config: String, found: DataFrame,
          bank: Option[DataFrame]): Unit = {
        val hits = found.select(col("query_id"), col("neighbor_id"))
          .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
          .count()
        val bal = bank.map { b =>
          val r = IvfRelational.assign(emb, b)
            .groupBy(col("cell")).agg(count(lit(1)).as("sz"))
            .agg(count(lit(1)).as("nc"), max(col("sz")).as("mx"),
              avg(col("sz")).as("mean"))
            .head()
          f"${r.getLong(0)} | ${r.getLong(1) / r.getDouble(2)}%.1f"
        }.getOrElse("- | -")
        println(f"| $dir (n=$n) | $family | $config " +
          f"| ${hits.toDouble / total}%.3f | $hits/$total | $bal |")
      }

      row("lsh", "8t x 6b, probe r2",
        Similarity.lshTopK(qs, emb, k = 5, dim = 64, tables = 8, bits = 6,
          multiProbe = true, probeRadius = 2), None)
      // stress rows: locate the recall cliff so the registry rows above
      // read as measurements, not saturation artifacts
      row("lsh stress", "8t x 6b, NO multiprobe",
        Similarity.lshTopK(qs, emb, k = 5, dim = 64, tables = 8, bits = 6),
        None)

      val bank128 = IvfRelational.trainBank(emb, nCells = 128, iters = 3,
        stride = 15).localCheckpoint(true)
      row("ivf_rel (p103)", "128c s15 np48",
        IvfRelational.topK(qs, emb, bank128, k = 5, nProbe = 48),
        Some(bank128))
      row("ivf_rel remedy", "128c s15 np96",
        IvfRelational.topK(qs, emb, bank128, k = 5, nProbe = 96), None)
      for (np <- Seq(4, 8, 16))
        row("ivf_rel stress", s"128c s15 np$np",
          IvfRelational.topK(qs, emb, bank128, k = 5, nProbe = np), None)

      // cells ∝ corpus (the 10× remedy): 256 cells at the same coverage
      val bank256 = IvfRelational.trainBank(emb, nCells = 256, iters = 3,
        stride = 15).localCheckpoint(true)
      row("ivf_rel remedy", "256c s15 np96",
        IvfRelational.topK(qs, emb, bank256, k = 5, nProbe = 96),
        Some(bank256))

      val frac = math.min(1.0, 1024.0 / n)
      val sample = Curation.sampleUniform(emb, "vec_id", frac)
      val bankS = IvfRelational.trainBank(sample, nCells = 128, iters = 3,
        stride = 3).localCheckpoint(true)
      row("ivf_sampled (p106)", f"frac=$frac%.2f 128c s3 np64",
        IvfRelational.topK(qs, emb, bankS, k = 5, nProbe = 64),
        Some(bankS))
      row("ivf_sampled remedy", f"frac=$frac%.2f 128c s3 np96",
        IvfRelational.topK(qs, emb, bankS, k = 5, nProbe = 96), None)
    }
    spark.stop()
  }
}
