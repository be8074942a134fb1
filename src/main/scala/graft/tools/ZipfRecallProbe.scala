package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.functions.{TextFunctions => TF}
import graft.operators.Dedup

/** Dev tool: the missing half of the dedup QUALITY story on realistic
  * data (VERDICT r10 next #1). Every recall number on record — p36's
  * MinHash/SimHash 1.00/1.00 — is measured on the shipped 31-word dense
  * vocabulary, where every doc shares shingles with every other and the
  * `maxBucketSize` caps barely engage. A Zipfian vocabulary is the shape
  * that actually stresses the caps (hot boilerplate shingles → hot
  * buckets → whole buckets dropped), and the round-10 Zipf probe
  * measured only RUNTIME there, never candidate quality.
  *
  * For each corpus this runs the p36 formulation — seed-restricted exact
  * 3-shingle-Jaccard-≥0.4 ground truth vs each family's candidate pairs
  * — at the registry cap AND effectively uncapped (the cap-loss
  * difference is the answer), plus bucket-occupancy stats from the raw
  * banded rows: how many buckets the cap drops, what fraction of banded
  * rows live in them, and the C(n,2) pair mass those buckets would have
  * expanded to (the cost the cap avoids).
  *
  * Usage: runMain graft.tools.ZipfRecallProbe [nSeeds] [dir1] [dir2] ...
  * (defaults: 200 seeds, target/zipf01 target/zipf1).
  */
object ZipfRecallProbe {
  def main(args: Array[String]): Unit = {
    val nSeeds = args.headOption.map(_.toInt).getOrElse(200)
    val dirs = if (args.length > 1) args.drop(1).toSeq
      else Seq("target/zipf01", "target/zipf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("zipfrecall").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("| corpus | family | cap | recall | hits/total | buckets>cap " +
      "| rows_in_dropped | dropped_pair_mass |")
    println("|---|---|---|---|---|---|---|---|")

    for (dir <- dirs) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      // p36's exact ground truth: every 3-shingle Jaccard >= 0.4 pair
      // touching a seed doc, via the broadcast explode-join (scan-shaped)
      val sh = docs.select(col("doc_id"),
          array_distinct(TF.tokenShingles(TF.tokens(col("text")), 3)).as("sh"))
        .withColumn("sz", size(col("sh")))
      val exact = broadcast(sh.filter(col("doc_id") < nSeeds)
          .select(col("doc_id").as("seed"), col("sz").as("sz_s"),
            explode(col("sh")).as("g")))
        .join(sh.select(col("doc_id").as("other"), col("sz").as("sz_o"),
            explode(col("sh")).as("g")), "g")
        .filter(col("seed") =!= col("other"))
        .groupBy(col("seed"), col("other"), col("sz_s"), col("sz_o"))
        .agg(count(lit(1)).as("inter"))
        .filter(col("inter").cast(DoubleType) /
          (col("sz_s") + col("sz_o") - col("inter")).cast(DoubleType) >= 0.4)
        .select(least(col("seed"), col("other")).as("id_a"),
          greatest(col("seed"), col("other")).as("id_b"))
        .distinct()
        .localCheckpoint(true)
      val total = exact.count()

      def recallRow(family: String, cap: Int, found: DataFrame,
          stats: Option[(Long, Long, Long)]): Unit = {
        if (total == 0) {
          println(s"| $dir | $family | $cap | n/a (no qualifying exact " +
            "pairs at this corpus/seed) | 0/0 | - |")
          return
        }
        val hits = found
          .filter(col("id_a") < nSeeds || col("id_b") < nSeeds)
          .select(col("id_a"), col("id_b"))
          .join(exact, Seq("id_a", "id_b"), "left_semi")
          .count()
        val (nOver, rowsOver, pairMass) = stats.getOrElse((0L, 0L, 0L))
        val statCols = stats.map(_ => f"$nOver | $rowsOver | $pairMass")
          .getOrElse("- | - | -")
        println(f"| $dir | $family | $cap | ${hits.toDouble / total}%.3f " +
          f"| $hits/$total | $statCols |")
      }

      // bucket-occupancy stats from the raw banded rows at the given cap
      def bucketStats(banded: DataFrame, keys: Seq[String],
          cap: Int): (Long, Long, Long) = {
        val over = banded.groupBy(keys.map(col): _*)
          .agg(count(lit(1)).as("n")).filter(col("n") > cap)
          .agg(count(lit(1)).as("nb"), coalesce(sum(col("n")), lit(0L)).as("rows"),
            coalesce(sum(col("n") * (col("n") - 1)), lit(0L)).as("pm2"))
          .head()
        (over.getLong(0), over.getLong(1), over.getLong(2) / 2)
      }

      // registry config + uncapped (cap loss) + the band remedy (32 bands
      // of 2 rows — a flatter s-curve for borderline-0.4 pairs)
      for ((bands, cap) <- Seq((16, 200), (16, 1000000), (32, 200))) {
        val mhBanded = Dedup.minhashBandedRows(
          docs.select(col("doc_id").as("id"),
            array_distinct(TF.tokenShingles(TF.tokens(col("text")), 3)).as("sh")),
          numHashes = 64, bands = bands, seed = 42L)
        recallRow(s"minhash_b$bands", cap,
          Dedup.minhashPairs(docs, "doc_id", "text", numHashes = 64,
            bands = bands, shingleSize = 3, threshold = 0.4,
            maxBucketSize = cap),
          Some(bucketStats(mhBanded, Seq("band", "bucket"), cap)))
      }

      val sxBanded = Dedup.simhashBandedRows(docs, "doc_id", "text")
        .localCheckpoint(true)
      // registry config + uncapped + the verify-threshold remedy (Hamming
      // ≤ 6 — the chunk-pair band guarantee's own boundary)
      for ((hm, cap) <- Seq((4, 500), (4, 1000000), (6, 500), (6, 1000000))) {
        recallRow(s"simhash_h$hm", cap,
          Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = hm,
            maxBucketSize = cap),
          Some(bucketStats(sxBanded, Seq("chunk", "ckey"), cap)))
      }
    }
    spark.stop()
  }
}
