package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SteadyLit
import graft.functions.VectorExpressions
import graft.operators.Similarity

/** Streaming PQ codes maintenance with a CODEBOOK rebuild lifecycle —
  * the last versioned model without a drift → retrain → swap story
  * (VERDICT r12 missing #3: IVF banks rebuild via [[IvfStream
  * .rebuildIndex]], quantile bounds via `QuantileStream.rebuildStore`,
  * bloom m via its re-hash, but PQ codebooks were frozen driver
  * artifacts). Each embedding micro-batch encodes ONLY its own vectors
  * under the FROZEN codebooks (one batch-sized scan — the standing codes
  * never re-encode) and appends a (neighbor_id, codes) delta; the
  * per-batch QUANTIZATION-ERROR profile (sum over the batch of the
  * sequential squared-L2 between each vector and its codeword
  * reconstruction, decimal-staged so redeliveries and the oracle replay
  * it exactly) is the drift signal: codebooks trained on yesterday's
  * distribution reconstruct today's arrivals worse, and a rising error
  * profile tells the operator when [[rebuild]] is due.
  *
  * Two roots, the established convention:
  *   - `bookRoot/v0` — the codebook relation (j, code, cv), IMMUTABLE
  *     for the life of the codes store: codes written under one codebook
  *     and decoded under another reconstruct garbage silently, so
  *     [[appendBatch]] fails loud on anything but exactly `v0` AND pins
  *     the codebook's content fingerprint at `codesRoot/_params`
  *     ([[checkBook]] — the [[IvfStream.checkBank]] (fp, n) convention).
  *   - `codesRoot/v*` — (neighbor_id, codes) deltas (`v0` = standing).
  *     m small ints per vector at ANY corpus size — the PQ memory-scale
  *     contract; raw vectors never enter the store.
  *
  * Rebuild is a reader SWAP, never a mutation: retrain over the CURRENT
  * source corpus into NEW roots (the codes store is lossy by design, so
  * retraining reads the lake, not the store), re-encode once, and point
  * a fresh stream at the new roots. The old roots stay consistent for
  * in-flight readers; rollback is "don't swap". */
object PqStream {

  /** The codebook relation (j, code, cv) of a driver-side bank array —
    * model-sized (m × nCodes rows). */
  def bookRelation(spark: SparkSession,
      banks: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    (for {
      (bank, j) <- banks.zipWithIndex
      (cv, code) <- bank.zipWithIndex
    } yield (j, code, cv.toSeq)).toSeq.toDF("j", "code", "cv")
  }

  /** The driver-side bank array of a codebook relation — the inverse of
    * [[bookRelation]] (model-sized collect; the pqBank-cache
    * discipline). */
  def banksOf(spark: SparkSession, bookRoot: String)
      : Array[Array[Array[Double]]] = {
    val rows = Versions.read(spark, bookRoot, Seq(s"$bookRoot/v0"))
      .select(col("j"), col("code"), col("cv"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, s"empty codebook at $bookRoot/v0")
    val m = rows.map(_._1).max + 1
    val nCodes = rows.map(_._2).max + 1
    require(rows.length == m * nCodes,
      s"codebook at $bookRoot/v0 is ragged: ${rows.length} rows for " +
        s"$m x $nCodes")
    val banks = Array.ofDim[Array[Double]](m, nCodes)
    rows.foreach { case (j, c, cv) => banks(j)(c) = cv }
    banks
  }

  /** Order-independent content fingerprint of a codebook relation —
    * (bit_xor of `fingerprint64` over each row's canonical
    * `j:code:v0,v1,...` rendering, row count): the [[IvfStream
    * .bankFingerprint]] (fp, n) convention for the m-subspace model. */
  def bookFingerprint(book: DataFrame): (Long, Long) = {
    val row = book
      .select(graft.functions.HashFunctions.fingerprint64(concat_ws(":",
          col("j").cast("string"), col("code").cast("string"),
          concat_ws(",", transform(col("cv").cast("array<double>"),
            e => e.cast("string"))))).as("__fp"))
      .agg(expr("bit_xor(__fp)").as("fp"), count(lit(1)).as("n"))
      .head()
    require(row.getLong(1) > 0, "cannot fingerprint an empty codebook")
    (row.getLong(0), row.getLong(1))
  }

  private def writeBookPin(spark: SparkSession, codesRoot: String,
      fp: (Long, Long)): Unit = {
    import spark.implicits._
    Seq(("book_fp", fp._1), ("book_n", fp._2)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(s"$codesRoot/_params")
  }

  /** Fail loud unless the codebook at `bookRoot/v0` hashes to the
    * fingerprint pinned when `codesRoot` was built. */
  def checkBook(spark: SparkSession, bookRoot: String,
      codesRoot: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$codesRoot/_params")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p),
      s"$codesRoot/_params missing — writeStanding (which pins the " +
        "fingerprint of the codebook the codes were encoded under) " +
        "before appending or probing")
    val pinRows = Versions.read(spark, s"$codesRoot/_params",
      Seq(s"$codesRoot/_params"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val pinned = (pinRows("book_fp"), pinRows("book_n"))
    val actual = bookFingerprint(Versions.read(spark, bookRoot,
      Seq(s"$bookRoot/v0")))
    require(actual == pinned,
      s"codebook at $bookRoot does not match the codebook $codesRoot " +
        s"was encoded under (fingerprint/count $actual vs pinned $pinned)" +
        " — codes under one codebook decoded under another reconstruct " +
        "garbage; use the original book root or rebuild into new roots")
  }

  /** Write the standing stores: the codebooks as `bookRoot/v0`, the
    * standing corpus's codes as `codesRoot/v0`, and the frozen book's
    * content fingerprint as `codesRoot/_params`. */
  def writeStanding(spark: SparkSession, bookRoot: String,
      codesRoot: String, standing: DataFrame,
      banks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    Versions.guardStandingWrite(spark, bookRoot)
    Versions.guardStandingWrite(spark, codesRoot)
    bookRelation(spark, banks)
      .write.mode("overwrite").parquet(s"$bookRoot/v0")
    val frozen = banksOf(spark, bookRoot)
    writeBookPin(spark, codesRoot,
      bookFingerprint(Versions.read(spark, bookRoot, Seq(s"$bookRoot/v0"))))
    Similarity.pqEncode(standing, frozen, idCol, vecCol)
      .write.mode("overwrite").parquet(s"$codesRoot/v0")
  }

  /** The `foreachBatch` callback: encode batch `batchId`'s vectors under
    * the frozen codebooks, append the delta as `codesRoot/v{batchId+1}`,
    * and emit the batch's quantization-error profile to
    * `outRoot/b<batchId>` — (batch, n_vecs, err_sum): err_sum is the
    * decimal-staged sum of each vector's sequential squared-L2 to its
    * reconstruction, the drift signal that tells an operator when the
    * frozen codebooks stopped fitting the arrivals. Codes delta FIRST
    * (the correctness-bearing artifact; the profile is advisory — the
    * [[IvfStream.appendBatch]] write-order rationale). */
  def appendBatch(spark: SparkSession, bookRoot: String, codesRoot: String,
      outRoot: String, idCol: String, vecCol: String,
      autoCompactVersions: Option[Int] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    val bookVersions = Versions.list(spark, bookRoot)
    require(bookVersions.map(_._1) == Seq(0L),
      s"codebook at $bookRoot must be exactly v0 (found " +
        s"${bookVersions.map("v" + _._1).mkString(", ")}) — a codes store " +
        "is bound to the codebook it was encoded under; retrain into a " +
        "NEW root and rebuild, never mutate a live codebook")
    Versions.guardAppend(spark, codesRoot, "codes store", batchId,
      "writeStanding before starting the stream")
    // r18: the guard chain (checkBook's two model-sized actions, then
    // compaction) and the batch's encode STAGING are independent —
    // overlap them (guide §2.6, the IvfStream.appendBatch shape). A
    // failing guard still fails before any store write (the staging is
    // block-manager state only).
    val staged = graft.core.Par.eval(Seq[() => AnyRef](
      () => {
        checkBook(spark, bookRoot, codesRoot)
        // same fold parameters as compactStore: tombstoned codes drop
        // physically and the markers are consumed
        autoCompactVersions.foreach(k =>
          Versions.autoCompact(spark, codesRoot, batchId, k,
            tombstoneIdCol = Some("neighbor_id")))
        null
      },
      () => {
        val b = banksOf(spark, bookRoot)
        (b, Similarity.pqEncode(batch, b, idCol, vecCol)
          .localCheckpoint(true))
      }))
    val (banks, enc) = staged(1)
      .asInstanceOf[(Array[Array[Array[Double]]], DataFrame)]
    enc.write.mode("overwrite").parquet(s"$codesRoot/v${batchId + 1}")
    // the drift profile: reconstruction error of THIS batch under the
    // frozen books — sequential-fold doubles staged through DECIMAL so
    // the sum is partitioning-independent and oracle-replayable
    batch.select(col(idCol),
        VectorExpressions.seqSqDist(col(vecCol),
          VectorExpressions.pqDecode(
            VectorExpressions.pqCodes(col(vecCol), banks), banks))
          .as("__se"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("__se").cast("decimal(38,18)")).cast("double")
          .as("err_sum"))
      .withColumn("batch", SteadyLit.steadyLong(batchId))
      .write.mode("overwrite").parquet(s"$outRoot/b$batchId")
  }

  /** The assembled codes relation: every delta `<= upTo`, a plain scan
    * union (rows unique across deltas — each vector arrives in exactly
    * one batch). */
  def readCodes(spark: SparkSession, codesRoot: String,
      upTo: Long = Long.MaxValue): DataFrame = {
    val versions = Versions.list(spark, codesRoot).filter(_._1 <= upTo)
    require(versions.nonEmpty, s"no codes versions at $codesRoot")
    Versions.maskTombstones(spark, codesRoot,
      Versions.read(spark, codesRoot, versions.map(_._2.toString)),
      "neighbor_id", upTo)
  }

  /** Retract vector ids from the codes store ([[Versions.tombstone]]
    * contract): reads stop returning the retracted codes; compaction
    * drops their rows physically. The codebooks are a trained MODEL —
    * never retracted, only rebuilt ([[rebuild]]). */
  def tombstone(spark: SparkSession, codesRoot: String, ids: Seq[Long],
      batchId: Long): Unit =
    Versions.tombstone(spark, codesRoot, ids, batchId)

  /** The rebuild half of the reader-swap lifecycle the drift profiles
    * signal: retrain codebooks over the CURRENT source corpus (the codes
    * store is LOSSY by design — m ints per vector — so retraining reads
    * the lake, not the store) into `newBookRoot/v0`, re-encode the
    * corpus once into `newCodesRoot/v0`, and point a fresh stream at the
    * new roots. Both targets must be empty — rebuilding into a live root
    * is the in-place mutation the immutability guard exists to
    * prevent. */
  def rebuild(spark: SparkSession, corpus: DataFrame, newBookRoot: String,
      newCodesRoot: String, m: Int, nCodes: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit = {
    require(Versions.list(spark, newBookRoot).isEmpty,
      s"rebuild target $newBookRoot already holds versions — rebuild " +
        "writes a NEW root and readers swap; never rebuild into a live root")
    require(Versions.list(spark, newCodesRoot).isEmpty,
      s"rebuild target $newCodesRoot already holds versions — rebuild " +
        "writes a NEW root and readers swap; never rebuild into a live root")
    val banks = Similarity.pqTrain(corpus, m, nCodes, iters, idCol, vecCol)
    writeStanding(spark, newBookRoot, newCodesRoot, corpus, banks,
      idCol, vecCol)
  }

  /** Fold codes deltas `v0..v<upTo>` into a new base (rows unique across
    * deltas ⇒ the identity fold is read-equivalent); tombstoned vectors
    * drop physically (markers consumed). */
  def compactStore(spark: SparkSession, codesRoot: String, upTo: Long): Unit =
    Versions.compact(spark, codesRoot, upTo,
      tombstoneIdCol = Some("neighbor_id"))
}
