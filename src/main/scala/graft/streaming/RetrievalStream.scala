package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Retrieval

/** Streaming inverted-index maintenance — the sparse-RETRIEVAL member of
  * the incremental family (exact fps → [[PassageStream]], MinHash bands →
  * [[NearDupStream]], IVF cells → [[IvfStream]], PCA moments →
  * [[PcaStream]]; this closes the index-family matrix). Each document
  * micro-batch tokenizes ONLY its own docs and appends two deltas under
  * one root:
  *
  *   - `root/post/v*` — the batch's posting relation (term, doc_id, tf,
  *     dl). Postings are DISJOINT across batches (every (doc, term) row
  *     belongs to exactly one doc, and a doc arrives in exactly one
  *     batch), so the assembled posting table is the PLAIN union of
  *     deltas — zero exchanges on read, the [[IvfStream.readIndex]]
  *     discipline — and equals the one-shot
  *     [[Retrieval.postingsRelation]] over the union row-for-row.
  *   - `root/stats/v*` — the batch's 1-row (n_docs, total_dl). Exact
  *     integer sums are associative, so the assembled stats fold equals
  *     the one-shot corpus stats exactly (MODEL-sized deltas: one row
  *     per batch, like [[PcaStream]]'s moments).
  *
  * Probes ([[bm25TopK]]) therefore score BIT-IDENTICALLY to
  * [[Retrieval.bm25TopK]] over the assembled corpus: same filtered tf
  * rows, same df counts, same broadcast stats, same decimal-staged sum —
  * which is exactly what the p108 oracle replays. Unlike
  * [[Retrieval.writeInvertedIndex]] (whose side table PINS build-time
  * stats), the streamed index's stats fold tracks the assembled corpus,
  * so a probe always scores against the corpus it actually searches.
  *
  * At 100 TB: per-batch cost is one batch-sized tokenize+tf scan + a
  * model-sized stats row; the standing corpus is never re-tokenized. The
  * query-vocabulary filter pushes into every delta's parquet scan, so a
  * probe reads only matching term rows; the df aggregation exchanges
  * query-vocabulary rows only (the [[Retrieval.bm25TopK]] bound). Fold
  * deltas into the term-bucketed [[Retrieval.writeInvertedIndex]] layout
  * offline when probe traffic dominates ingest. */
object RetrievalStream {

  private def postRoot(root: String) = s"$root/post"
  private def statsRoot(root: String) = s"$root/stats"
  private def dlenRoot(root: String) = s"$root/dlen"

  /** Write the standing corpus's postings + stats + per-doc lengths as
    * the three `v0`s (all roots live-root-guarded:
    * [[Versions.guardStandingWrite]]). The doclen relation
    * ([[Retrieval.doclenRelation]] — 16 bytes/doc) exists for the
    * takedown path: it is what lets [[readStats]] retract a tombstoned
    * doc's (1, dl) stats contribution EXACTLY, including zero-token docs
    * the posting relation never saw. */
  def writeStanding(spark: SparkSession, root: String, standing: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      lease: Option[Versions.Lease] = None): Unit = {
    Versions.guardStandingWrite(spark, postRoot(root), lease)
    Versions.guardStandingWrite(spark, statsRoot(root), lease)
    Versions.guardStandingWrite(spark, dlenRoot(root), lease)
    // independent standing writes (a torn subset fails loud at
    // appendBatch's both-roots guard, whichever write crashed) — overlap
    // them (guide §2.6)
    graft.core.Par.run(
      () => Retrieval.postingsRelation(standing, idCol, textCol)
        .write.mode("overwrite").parquet(s"${postRoot(root)}/v0"),
      () => Retrieval.statsRelation(standing, idCol, textCol)
        .write.mode("overwrite").parquet(s"${statsRoot(root)}/v0"),
      () => Retrieval.doclenRelation(standing, idCol, textCol)
        .write.mode("overwrite").parquet(s"${dlenRoot(root)}/v0"))
  }

  /** The `foreachBatch` callback: tokenize batch `batchId`'s docs only,
    * append posting + stats + doclen deltas as `v{batchId+1}`
    * (overlapped — independent batch-id-named writes, guide §2.6); a
    * crash leaving any completion subset is healed by the checkpointed
    * redelivery overwriting all three deterministically. */
  def appendBatch(spark: SparkSession, root: String,
      idCol: String = "doc_id", textCol: String = "text",
      autoCompactVersions: Option[Int] = None,
      lease: Option[Versions.Lease] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    Versions.guardAppend(spark, postRoot(root), "postings", batchId,
      "writeStanding before starting the stream", lease)
    // BOTH standing roots, like every other two-root store: a
    // writeStanding that crashed between the postings and stats writes
    // would otherwise stream over stats that exclude the standing corpus
    // — silently wrong idf/length normalization on every probe
    require(Versions.list(spark, statsRoot(root)).exists(_._1 == 0L),
      s"standing stats ${statsRoot(root)}/v0 missing (postings v0 exists " +
        "— a writeStanding crashed between its two writes); re-run " +
        "writeStanding before starting the stream")
    require(Versions.list(spark, dlenRoot(root)).exists(_._1 == 0L),
      s"standing doclens ${dlenRoot(root)}/v0 missing (postings v0 exists " +
        "— a writeStanding crashed mid-way, or the store predates the " +
        "takedown-capable layout); re-run writeStanding before starting " +
        "the stream")
    autoCompactVersions.foreach { k =>
      // takedown-aware auto-compaction (VERDICT r14 wrong #2: the old
      // per-root folds deliberately preserved markers, so a long-running
      // stream that only ever auto-compacted paid the marker fan-in —
      // one listStatus + one broadcast read per marker dir per read —
      // FOREVER): when the version count trips the threshold, run the
      // full three-root orchestration, bounding both the version fan-in
      // AND the accumulated marker count by the compaction cadence.
      // `upTo = batchId` is inside the compact safety bound for
      // [[Versions.autoCompact]]'s reason: the executing batch is
      // uncommitted, so every committed batch is < batchId.
      require(k >= 1, s"autoCompactVersions must be >= 1: $k")
      val visible = Versions.list(spark, postRoot(root))
        .filter(_._1 <= batchId)
      if (visible.size > k) compactStore(spark, root, upTo = batchId, lease)
    }
    val b = batch.localCheckpoint(true)
    // the three per-batch delta writes are independent (distinct
    // batch-id-named paths; a crash leaving any completion subset is the
    // documented torn window the checkpointed redelivery heals, whichever
    // side landed) — overlap them (guide §2.6)
    graft.core.Par.run(
      () => Retrieval.postingsRelation(b, idCol, textCol)
        .write.mode("overwrite")
        .parquet(s"${postRoot(root)}/v${batchId + 1}"),
      () => Retrieval.statsRelation(b, idCol, textCol)
        .write.mode("overwrite")
        .parquet(s"${statsRoot(root)}/v${batchId + 1}"),
      () => Retrieval.doclenRelation(b, idCol, textCol)
        .write.mode("overwrite")
        .parquet(s"${dlenRoot(root)}/v${batchId + 1}"))
  }

  private def foldStats(df: DataFrame): DataFrame =
    df.agg(sum(col("n_docs")).cast("long").as("n_docs"),
      sum(col("total_dl")).cast("long").as("total_dl"))

  /** Retract doc ids from the index. Two batch-id-named writes, both
    * deterministic under redelivery:
    *
    *   1. `stats/c<batchId>` — the deleted docs' exact aggregate
    *      contribution, NEGATED, as an IN-BAND stats correction row
    *      (computed once here from the doclen relation — dl per doc,
    *      zero-token docs included). [[readStats]] is then a pure exact
    *      integer fold over `v* ∪ c*`: no live marker-join at read time,
    *      and — the ADVICE r15 #1 point — no compaction step ever has to
    *      bake a subtraction it cannot re-derive, so [[compactStore]] is
    *      idempotent across any partial completion.
    *   2. `post/d<batchId>` — the [[Versions.tombstone]] marker;
    *      [[readPostings]] masks the docs' posting rows.
    *
    * The correction lands first: a crash between the writes leaves stats
    * already correct for the post-takedown corpus and the posting mask
    * pending — exactly the torn window the checkpointed redelivery heals
    * (the appendBatch precedent). Post-takedown probes score
    * bit-identically to [[Retrieval.bm25TopK]] over the corpus minus the
    * deleted docs; [[compactStore]] makes the retraction physical.
    *
    * This pair IS the store's takedown verb — a cross-store sweep must
    * fan out through it ([[Takedown.Target]]'s verb form), not through a
    * bare [[Versions.tombstoneFrom]] on the posting root ([[readStats]]
    * fails loud on a marker with no matching correction). */
  def tombstone(spark: SparkSession, root: String, ids: Seq[Long],
      batchId: Long, lease: Option[Versions.Lease] = None): Unit = {
    import spark.implicits._
    tombstoneFrom(spark, root, ids.toDF("id"), batchId, lease)
  }

  /** [[tombstone]] with the retracted ids as a relation — the
    * predicate-driven sweep shape: the id set is computed distributively
    * (a quality/PII/licensing pass over the corpus) and never touches
    * the driver. Id hygiene (single long-castable column, nulls dropped,
    * empty refused) is [[Versions.tombstoneFrom]]'s contract. */
  def tombstoneFrom(spark: SparkSession, root: String, ids: DataFrame,
      batchId: Long, lease: Option[Versions.Lease] = None): Unit = {
    Versions.checkWriter(spark, postRoot(root), lease)
    require(ids.schema.fields.length == 1,
      s"tombstoneFrom takes a single id column, got ${ids.schema.fieldNames
        .mkString(", ")}")
    require(Versions.list(spark, postRoot(root)).exists(_._1 == 0L),
      s"tombstone refused: ${postRoot(root)}/v0 missing — the store must " +
        "exist before ids can be retracted from it")
    val rel = ids.toDF("id").select(col("id").cast("long").as("id"))
      .filter(col("id").isNotNull)
      .distinct().localCheckpoint(true)
    require(rel.limit(1).count() > 0, "tombstone of an empty id set")
    val dlen = Versions.list(spark, dlenRoot(root))
    require(dlen.nonEmpty,
      s"takedown refused: ${dlenRoot(root)} is empty — the store predates " +
        "the takedown-capable layout; rebuild via writeStanding")
    // the correction subtracts only ids ALIVE as of the markers strictly
    // before this batch (ADVICE r16 #1): two overlapping sweeps are
    // in-contract input (a GDPR pass re-listing a quality pass's ids),
    // and the posting mask is distinct-idempotent, but a second (1, dl)
    // subtraction for an already-dead id would corrupt readStats silently
    // and compaction would bake it in. `upTo = batchId - 1` ignores this
    // batch's own marker, so a redelivered sweep re-computes the SAME
    // correction (redelivery-stable, the readAssignmentsMasked precedent)
    val alive = Versions.deadSet(spark, postRoot(root), upTo = batchId - 1)
      .fold(rel)(dead => rel.join(broadcast(dead), Seq("id"), "left_anti"))
    Versions.read(spark, dlenRoot(root), dlen.map(_._2.toString))
      .join(broadcast(alive.select(col("id").as("doc_id"))), "doc_id")
      .agg((-count(lit(1))).cast("long").as("n_docs"),
        (-coalesce(sum(col("dl")), lit(0L))).cast("long").as("total_dl"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${statsRoot(root)}/c$batchId")
    rel.coalesce(1).write.mode("overwrite")
      .parquet(s"${postRoot(root)}/d$batchId")
  }

  /** The root this store's takedown markers live under (the posting
    * root). A cross-store sweep must fan out through [[tombstoneFrom]]
    * (the verb form of [[Takedown.Target]]) — a bare marker write here
    * would skip the stats correction and [[readStats]] fails loud. */
  def markerRoot(root: String): String = postRoot(root)

  /** Un-delete (VERDICT r16 next #4 — the store's OWN revive path): a
    * takedown here pairs its posting marker with an in-band stats
    * correction, so a bare [[Versions.revive]] would resurrect the
    * postings while the stats stay corrected — silently-wrong idf and
    * length normalization on every probe (which is why the generic verb
    * was refused until this existed). This verb INVERTS the pair: a
    * POSITIVE stats correction `stats/c<batchId>` re-adding the revived
    * docs' exact (1, dl) — the same dlen rows the takedown subtracted,
    * still physically present because [[compactStore]]'s fold is
    * deadSet-aware and revive-of-compacted refuses at the dead check —
    * then the `r<batchId>` marker via [[Versions.revive]] (newest-verb-
    * wins, every [[Versions.revive]] contract clause applies). The
    * correction lands first (the [[tombstoneFrom]] ordering), so a crash
    * between the writes is the same newest-batch torn window
    * [[readStats]] documents, healed by redelivery. Post-revive probes
    * score bit-identically to a from-scratch index over retained ∪
    * revived. */
  def revive(spark: SparkSession, root: String, ids: DataFrame,
      batchId: Long, lease: Option[Versions.Lease] = None): Unit = {
    Versions.checkWriter(spark, postRoot(root), lease)
    require(ids.schema.fields.length == 1,
      s"revive takes a single id column, got ${ids.schema.fieldNames
        .mkString(", ")}")
    val rel = ids.toDF("id").select(col("id").cast("long").as("id"))
      .filter(col("id").isNotNull)
      .distinct().localCheckpoint(true)
    require(rel.limit(1).count() > 0, "revive of an empty id set")
    // the dead-as-of-(batchId-1) check runs HERE, before the correction
    // write (Versions.revive re-checks before its marker write): a
    // refused revive must not leave an orphan correction behind
    val dead = Versions.deadSet(spark, postRoot(root), upTo = batchId - 1)
    require(dead.isDefined,
      s"revive refused: no tombstones at ${postRoot(root)} — nothing to " +
        "revive")
    val notDead = rel.join(dead.get, Seq("id"), "left_anti")
      .limit(5).collect().map(_.getLong(0))
    require(notDead.isEmpty,
      s"revive refused: ids ${notDead.mkString(", ")} are not taken down " +
        s"at ${postRoot(root)} as of batch ${batchId - 1}")
    val dlen = Versions.list(spark, dlenRoot(root))
    require(dlen.nonEmpty,
      s"revive refused: ${dlenRoot(root)} is empty — the store predates " +
        "the takedown-capable layout")
    Versions.read(spark, dlenRoot(root), dlen.map(_._2.toString))
      .join(broadcast(rel.select(col("id").as("doc_id"))), "doc_id")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).cast("long").as("total_dl"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"${statsRoot(root)}/c$batchId")
    Versions.revive(spark, postRoot(root), rel, batchId, lease)
  }

  /** The assembled posting relation: plain union, zero exchanges (rows
    * disjoint across deltas by construction), minus tombstoned docs
    * ([[Versions.maskTombstones]] — broadcast anti-join; plan untouched
    * when no takedown ever happened). */
  def readPostings(spark: SparkSession, root: String,
      upTo: Long = Long.MaxValue): DataFrame = {
    val versions = Versions.list(spark, postRoot(root)).filter(_._1 <= upTo)
    require(versions.nonEmpty, s"no posting versions at ${postRoot(root)}")
    // revive markers are legal here since the store grew its own paired
    // revive verb ([[revive]] — positive stats correction + r marker);
    // [[readStats]]' orphan check still fails loud on an r marker with
    // no correction (a generic Versions.revive bypassing the verb)
    Versions.maskTombstones(spark, postRoot(root),
      Versions.read(spark, postRoot(root), versions.map(_._2.toString)),
      "doc_id", upTo)
  }

  /** The assembled 1-row stats: exact integer fold of the version deltas
    * AND the in-band takedown corrections (`c*` rows, [[tombstoneFrom]] —
    * each deleted doc already retracted its exact (1, dl), zero-token
    * docs included). Integer addition is associative, so the fold equals
    * the one-shot stats over the retained corpus regardless of delta or
    * correction order. Fails loud on a posting marker with no matching
    * correction — a bare [[Versions.tombstoneFrom]] on the posting root
    * is not this store's takedown verb. */
  def readStats(spark: SparkSession, root: String,
      upTo: Long = Long.MaxValue): DataFrame = {
    val versions = Versions.list(spark, statsRoot(root)).filter(_._1 <= upTo)
    require(versions.nonEmpty, s"no stats versions at ${statsRoot(root)}")
    val corrections = Versions.listPrefixed(spark, statsRoot(root), 'c')
      .filter(_._1 <= upTo)
    val markers = (Versions.listTombstones(spark, postRoot(root)) ++
      Versions.listRevives(spark, postRoot(root))).map(_._1)
      .filter(_ <= upTo)
    val orphaned = markers.filterNot(corrections.map(_._1).toSet)
    require(orphaned.isEmpty,
      s"posting markers at batch ${orphaned.mkString(", ")} have no stats " +
        s"correction under ${statsRoot(root)} — retract/revive through " +
        "RetrievalStream.tombstoneFrom/revive (the store's lifecycle " +
        "verbs), not a bare marker write")
    // the SYMMETRIC check (ADVICE r16 #2): a correction with no matching
    // posting marker, below the newest lifecycle batch, is one of two
    // crash states the listings alone cannot distinguish (they differ
    // only in whether the postings still serve the ids, and a correction
    // row carries no id list): (a) a [[compactStore]] crashed between
    // its posting step (markers consumed, rows dropped) and its stats
    // step — healed by RE-RUNNING compactStore at the same bound, which
    // consumes the corrections (the ADVICE r15 #1 resumability
    // contract); (b) a tombstoneFrom/revive crashed after its
    // correction-first write and was never redelivered — permanently
    // torn, rebuild. The newest-batch orphan stays legal (the in-flight
    // window redelivery heals). Refusing loud with both recoveries
    // named beats the old behavior for BOTH causes: (a) previously read
    // fine and still recovers with one call; (b) previously served
    // silently-wrong stats forever.
    val all = markers ++ corrections.map(_._1)
    val torn =
      if (all.isEmpty) Nil
      else corrections.map(_._1)
        .filterNot(markers.toSet).filter(_ < all.max)
    require(torn.isEmpty,
      s"stats corrections c${torn.mkString(", c")} have no posting marker " +
        s"under ${postRoot(root)} and newer lifecycle batches exist — " +
        "if a compactStore crashed mid-orchestration, re-run it at the " +
        "same bound (consumes the corrections); if a tombstoneFrom/" +
        "revive crashed and was never redelivered, the store is " +
        "permanently torn (rebuild via writeStanding)")
    foldStats(Versions.read(spark, statsRoot(root),
      (versions ++ corrections).map(_._2.toString)))
  }

  /** BM25 top-k over the assembled index — bit-identical to
    * [[Retrieval.bm25TopK]] over the corpus union. */
  def bm25TopK(spark: SparkSession, root: String, queryTerms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      upTo: Long = Long.MaxValue): DataFrame =
    Retrieval.bm25TopKOver(readPostings(spark, root, upTo),
      readStats(spark, root, upTo), queryTerms, k, k1, b)

  /** Fold all three stores' deltas `v0..v<upTo>` into new bases
    * (postings by identity — rows disjoint; stats by the integer fold of
    * versions AND in-band corrections; doclens by identity), making any
    * takedown PHYSICAL: deleted docs' doclen and posting rows drop, the
    * consumed markers and corrections are deleted — reads before and
    * after are identical. The posting base CLUSTERS by its probe key
    * `term` (the probe's query-vocabulary filter pushes into the parquet
    * scan, so a sorted base prunes standing row groups per probe —
    * VERDICT r13 #2).
    *
    * Idempotent across partial completion (ADVICE r15 #1): each root's
    * rewrite is independently read-equivalent — the stats fold never
    * bakes a subtraction it could double-apply (the correction rows are
    * in-band until the same atomic-per-root rewrite that consumes them),
    * the doclen drop is an anti-join (re-running drops nothing new), and
    * the posting mask of already-dropped rows is a no-op. A crash
    * between any two steps leaves every read correct and the re-run
    * finishing the remaining roots ([[Versions.compact]]'s `allowSingle`
    * — a root a previous run already folded to one version no longer
    * wedges the orchestration). Ordering (doclens → postings → stats)
    * keeps the marker/correction pair consistent at every boundary: a
    * posting marker never outlives its stats correction. */
  def compactStore(spark: SparkSession, root: String, upTo: Long,
      lease: Option[Versions.Lease] = None): Unit = {
    // the pending-revive refusal, HOISTED ahead of the first physical
    // step: Versions.compact refuses a bound that would orphan a revive
    // newer than it, but only on the marker-bearing posting root — and
    // the dlen fold runs FIRST here. Without this check, the dlen rows
    // of an id that is dead-as-of-upTo but has a pending revive above
    // the bound would drop physically, the posting compaction would
    // then refuse, and the already-revived doc would be left live with
    // no dlen row — a FUTURE takedown of it would subtract (0, 0) and
    // the stats would go silently wrong forever.
    val pending = Versions.listRevives(spark, postRoot(root))
      .filter(_._1 > upTo)
    if (pending.nonEmpty)
      Versions.deadSet(spark, postRoot(root), upTo).foreach { dead =>
        val orphaned = Versions.read(spark, s"${postRoot(root)}#d",
            pending.map(_._2.toString)).select(col("id"))
          .join(dead, Seq("id"), "left_semi")
          .limit(5).collect().map(_.getLong(0))
        require(orphaned.isEmpty,
          s"compactStore($root, upTo=$upTo) refused: ids " +
            s"${orphaned.mkString(", ")} have a revive marker newer than " +
            "the bound but their rows would be physically dropped here — " +
            "raise upTo past the revive or withdraw it")
      }
    // resolve the deleted ids BEFORE the posting compaction consumes the
    // markers (eager checkpoint — the relation must survive the delete).
    // NOTE deadSet resolution: ids dead as of upTo (tombstoned, not since
    // revived) — a revived id's rows must survive the physical fold
    val delIds = Versions.deadSet(spark, postRoot(root), upTo)
      .map(_.select(col("id").as("doc_id")).localCheckpoint(true))
    Versions.compact(spark, dlenRoot(root), upTo,
      df => delIds.fold(df)(ids =>
        df.join(broadcast(ids), Seq("doc_id"), "left_anti")),
      allowSingle = true, lease = lease)
    Versions.compact(spark, postRoot(root), upTo,
      tombstoneIdCol = Some("doc_id"), clusterBy = Seq("term"),
      allowSingle = true, lease = lease)
    Versions.compact(spark, statsRoot(root), upTo, foldStats,
      allowSingle = true,
      extraDirs = Versions.listPrefixed(spark, statsRoot(root), 'c')
        .filter(_._1 <= upTo).map(_._2),
      lease = lease)
  }
}
