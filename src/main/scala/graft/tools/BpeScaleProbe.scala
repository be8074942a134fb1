package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Vocab
import graft.functions.{TextFunctions => TF}

/** BPE at a REALISTIC merge count — the r11 VERDICT #5 probe. The batched
  * trainer removed the one-job-per-merge structural cap (proven at p97's
  * 256 merges, ~12 rounds); this measures what a production-scale
  * vocabulary actually costs on the realistic-vocabulary corpus
  * (target/zipf1 — 20k-word Zipf(1.07), the same fixture as the text
  * recall audit): rounds, per-round acceptance, pool-pull rows (the only
  * driver-side object — fixed at maxPerRound × poolFactor rows,
  * model-sized by construction), wall time, and the
  * divergence-from-sequential-greedy rate (the parallel-BPE trade) at a
  * sequential-feasible prefix.
  *
  * Usage: runMain graft.tools.BpeScaleProbe [zipfDir] [seqMerges]
  * Prints a markdown table for SURVEY §6.
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/zipf1")
    val seqMerges = if (args.length > 1) args(1).toInt else 512
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .appName("bpe-scale-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val words = docs.select(explode(TF.tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val nWords = words.count()
    println(s"corpus: $dir — $nWords distinct words")

    // sequential-greedy baseline at a feasible prefix: the divergence
    // yardstick (one Spark job per merge — the very shape the batched
    // trainer exists to avoid; this is why it stays a PREFIX)
    val t0 = System.nanoTime()
    val seqRows = Vocab.bpeTrain(words, "word", "cnt", merges = seqMerges)
      .orderBy("step").collect()
    val seq = seqRows
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
    val seqVocab = seqRows.map(_.getAs[String]("merged")).toSet
    val seqSecs = (System.nanoTime() - t0) / 1e9
    println(f"sequential $seqMerges merges: $seqSecs%.1f s " +
      f"(${seqSecs / seqMerges * 1000}%.0f ms/merge — the structural cap)")

    println("| merges | maxPerRound | pool rows/round | rounds | " +
      "accept/round avg (min..max) | wall s | s/merge | emitted | " +
      s"prefix-$seqMerges pair divergence | vocab divergence |")
    println("|---|---|---|---|---|---|---|---|---|---|")
    for ((merges, mpr, pf) <- Seq((4096, 64, 8), (8192, 64, 8))) {
      val t1 = System.nanoTime()
      val mt = Vocab.bpeTrainBatched(words, "word", "cnt", merges,
          maxPerRound = mpr, poolFactor = pf, maxRounds = 2000)
        .orderBy("step").collect()
      val secs = (System.nanoTime() - t1) / 1e9
      val emitted = mt.length
      val rounds = if (mt.isEmpty) 0 else mt.map(_.getAs[Int]("round")).max
      val perRound = mt.groupBy(_.getAs[Int]("round")).map(_._2.length)
      val batchedPrefix = mt.take(seqMerges)
        .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
        .toSet
      val div =
        if (seq.length < seqMerges || batchedPrefix.size < seqMerges) -1.0
        else 1.0 - seq.count(batchedPrefix.contains).toDouble / seqMerges
      // fairer: overlap of the RESULTING symbol vocabularies at the same
      // prefix (pair sets differ whenever the same symbol composes in a
      // different merge order — "w1"+"2" vs "w"+"12" — which the pair
      // metric counts as divergence even when the learned vocab agrees)
      val batchedVocab = mt.take(seqMerges)
        .map(_.getAs[String]("merged")).toSet
      val vdiv =
        if (seqVocab.size < seqMerges) -1.0
        else 1.0 - seqVocab.count(batchedVocab.contains).toDouble / seqVocab.size
      val avg = if (perRound.isEmpty) 0.0 else perRound.sum.toDouble / perRound.size
      println(f"| $merges | $mpr | ${mpr * pf} | $rounds " +
        f"| $avg%.1f (${if (perRound.isEmpty) 0 else perRound.min}.." +
        f"${if (perRound.isEmpty) 0 else perRound.max}) | $secs%.1f " +
        f"| ${secs / math.max(emitted, 1)}%.3f | $emitted " +
        f"| ${if (div < 0) "n/a (exhausted)" else f"$div%.3f"} " +
        f"| ${if (vdiv < 0) "n/a" else f"$vdiv%.3f"} |")
      if (emitted < merges)
        println(s"  NOTE: pool exhausted at $emitted merges — the corpus's " +
          "distinct adjacent-pair inventory is the ceiling, not the trainer")
    }
    spark.stop()
  }
}
