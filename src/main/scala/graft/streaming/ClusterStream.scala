package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SteadyLit

import graft.operators.Dedup

/** Incremental cluster-identity + canonical-election maintenance at ingest
  * (VERDICT r14 next #4 — the remaining dedup lifecycle gap): near-dup
  * PAIRS without cluster identity can't answer "which copy do we keep"
  * across batches, and a takedown can delete a canonical (or a whole
  * cluster's minimum-id label). This store folds a pair-delta stream
  * ([[NearDupStream.filterBatch]]'s returned pairs, or any pair relation)
  * into standing cluster state whose READ always equals the from-scratch
  * batch answer: labels = [[Dedup.connectedComponentsStar]] min-id
  * components over all retained pairs (singletons label themselves), and
  * canonicals = [[Dedup.canonicalPerCluster]]'s argmax-score (tie → min
  * id) election, generalized to cover singleton clusters.
  *
  * Three versioned roots under one `root` (batch-id-named deltas, the
  * [[Versions]] lineage/idempotence contract):
  *
  *   - `root/assign/v*` — (id, cid, score, __v) assignment rows. The base
  *     `v0` holds EXACTLY one row per doc; deltas hold new arrivals plus
  *     RELABELS (cluster merges/splits rewrite whole clusters — the min-id
  *     invariant `cid = min member id` is maintained inductively, which is
  *     what makes merge labels computable from cids alone). Read = base
  *     minus delta-superseded ids (broadcast anti-join — delta ids are
  *     recent-batch-sized) plus newest-per-id over the DELTAS only, so the
  *     per-batch fold never runs a store-wide window; compaction folds
  *     back to one row per id, clustered by `cid` so the fold's
  *     cluster-membership reads prune the base scan by a pushed `cid IN`
  *     (the trickle-probe posture of the other stores).
  *   - `root/canon/v*` — (cid, keep_id, score, n_members, __v) election
  *     rows, newest-per-cid; a label that merges away or loses all
  *     retained members gets a DEAD row (n_members = 0) so reads stay
  *     append-only.
  *   - `root/pairs/v*` — the folded pair deltas, kept because takedown
  *     repair must re-run connectivity INSIDE affected components over the
  *     retained pairs (deletion can SPLIT a component — decremental
  *     connectivity is recomputed component-locally, never corpus-wide).
  *
  * Takedown ([[retract]]): markers land on the assign + pairs roots
  * ([[Versions.tombstone]] contract — deleted docs vanish from every
  * read), then the affected components — and only those — are re-solved
  * over their retained pairs: new min-id labels (splits included),
  * re-elected canonicals (the deleted-canonical case), dead rows for
  * labels that no longer exist. Work is component-sized; the sweep that
  * FINDS the ids is the caller's ([[Takedown.takedownAll]] composes).
  *
  * Reference analogue: none (the reference has no persistent state); the
  * batch kernels this must agree with are `Dedup.scala`'s
  * connectedComponentsStar / canonicalPerCluster. */
object ClusterStream {

  private def assignRoot(root: String) = s"$root/assign"
  private def canonRoot(root: String) = s"$root/canon"
  private def pairsRoot(root: String) = s"$root/pairs"

  /** Bootstrap: batch-solve the standing corpus with the batch kernels and
    * write the three `v0`s. `standingDocs` is (idCol, scoreCol); every doc
    * gets an assignment row (pair-graph members via star contraction,
    * everything else a singleton labeled by itself). */
  def writeStanding(spark: SparkSession, root: String,
      standingDocs: DataFrame, standingPairs: DataFrame,
      idCol: String = "id", scoreCol: String = "score",
      lease: Option[Versions.Lease] = None): Unit = {
    Seq(assignRoot(root), canonRoot(root), pairsRoot(root))
      .foreach(Versions.guardStandingWrite(spark, _, lease))
    val pairs = standingPairs.select(col("id_a"), col("id_b"))
      .localCheckpoint(true)
    val labels =
      if (pairs.isEmpty) spark.emptyDataFrame
        .select(lit(0L).as("id"), lit(0L).as("component")).limit(0)
      else Dedup.connectedComponentsStar(pairs)
    val assign = standingDocs
      .select(col(idCol).as("id"), col(scoreCol).cast("double").as("score"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cid"),
        col("score"), lit(0L).as("__v"))
    // the canon base derives from the WRITTEN assign base (sequential
    // pair); the pairs base is independent of both — overlap it with
    // that pair (guide §2.6)
    graft.core.Par.run(
      () => {
        assign.write.mode("overwrite").parquet(s"${assignRoot(root)}/v0")
        electCanon(Versions.read(spark, assignRoot(root),
            Seq(s"${assignRoot(root)}/v0")), 0L)
          .write.mode("overwrite").parquet(s"${canonRoot(root)}/v0")
      },
      () => pairs.write.mode("overwrite").parquet(s"${pairsRoot(root)}/v0"))
  }

  /** Argmax-score (tie → min id) election + member count per cid — the
    * [[Dedup.canonicalPerCluster]] rule over an assignment slice, in AGG
    * shape (VERDICT r15 next #1): `max_by` over the composite ordering
    * key (score, −id) is a declarative aggregate with MAP-SIDE partial
    * combine, so a planted mega-cluster (10⁴+ members under one cid)
    * contributes at most one partial row per map partition to the
    * exchange — the window form sorted every member row inside one
    * reducer task, a task-skew cliff exactly where clusters are biggest.
    * The ordering key is total (ids unique within a cluster), so the
    * election is deterministic and equal to the window form row-for-row
    * (ClusterStreamSpec pins the tie case; ids are non-negative by the
    * store's contract, so −id cannot overflow). */
  private[graft] def electCanon(members: DataFrame, v: Long): DataFrame =
    members.select(col("id"), col("cid"), col("score"))
      .groupBy(col("cid"))
      .agg(max_by(struct(col("id"), col("score")),
          struct(col("score"), (-col("id")).as("nid"))).as("__b"),
        count(lit(1)).as("n_members"))
      .select(col("cid"), col("__b.id").as("keep_id"),
        col("__b.score").as("score"), col("n_members"), SteadyLit.steadyLong(v).as("__v"))

  /** Current assignments: base v0 (one row per id) superseded by the
    * newest delta row per id, tombstoned ids masked. The newest-per-id
    * window runs over DELTAS only — recent-batch-sized until compaction
    * folds them into the base. */
  def readAssignments(spark: SparkSession, root: String,
      upTo: Long = Long.MaxValue): DataFrame =
    readAssignmentsMasked(spark, root, upTo, upTo)

  /** [[readAssignments]] with the tombstone mask bounded separately from
    * the version fold — [[retract]]'s affected-component resolution must
    * see the rows ITS OWN marker hides (mask `< batchId`, versions
    * `<= batchId`), or a redelivered retract would resolve an empty
    * affected set and overwrite its first delivery's repair with nothing
    * (caught by ClusterStreamSpec's idempotence gate). */
  private def readAssignmentsMasked(spark: SparkSession, root: String,
      upTo: Long, maskUpTo: Long): DataFrame = {
    val ar = assignRoot(root)
    val versions = Versions.list(spark, ar).filter(_._1 <= upTo)
    require(versions.exists(_._1 == 0L), s"no assignment base at $ar/v0")
    requireRepairedRevives(spark, root)
    val base = Versions.read(spark, ar,
      versions.filter(_._1 == 0L).map(_._2.toString))
    val deltaDirs = versions.filter(_._1 > 0L).map(_._2.toString)
    val current =
      if (deltaDirs.isEmpty) base
      else {
        val w = Window.partitionBy(col("id")).orderBy(col("__v").desc)
        val newest = Versions.read(spark, ar, deltaDirs)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .localCheckpoint(true)
        base.join(broadcast(newest.select(col("id"))), Seq("id"),
            "left_anti")
          .unionByName(newest)
      }
    Versions.maskTombstones(spark, ar,
      current.select(col("id"), col("cid"), col("score"), col("__v")),
      "id", maskUpTo)
  }

  /** Current elections: newest row per cid, dead labels (n_members = 0)
    * dropped. Same read posture as [[readAssignments]]: the base holds
    * one row per cid (writeStanding/compact invariant), so the
    * newest-per-cid window runs over the DELTAS only and the base joins
    * back through a broadcast anti-join — never a store-wide window. */
  def readCanonicals(spark: SparkSession, root: String,
      upTo: Long = Long.MaxValue): DataFrame = {
    val cr = canonRoot(root)
    val versions = Versions.list(spark, cr).filter(_._1 <= upTo)
    require(versions.exists(_._1 == 0L), s"no canonical base at $cr/v0")
    val base = Versions.read(spark, cr,
      versions.filter(_._1 == 0L).map(_._2.toString))
    val deltaDirs = versions.filter(_._1 > 0L).map(_._2.toString)
    val current =
      if (deltaDirs.isEmpty) base
      else {
        val w = Window.partitionBy(col("cid")).orderBy(col("__v").desc)
        val newest = Versions.read(spark, cr, deltaDirs)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .localCheckpoint(true)
        base.join(broadcast(newest.select(col("cid"))), Seq("cid"),
            "left_anti")
          .unionByName(newest)
      }
    current.filter(col("n_members") > 0)
      .select(col("cid"), col("keep_id"), col("score"), col("n_members"))
  }

  /** The folded pair relation, pairs touching a tombstoned id masked on
    * BOTH endpoints. */
  def readPairs(spark: SparkSession, root: String,
      upTo: Long = Long.MaxValue): DataFrame = {
    val pr = pairsRoot(root)
    val versions = Versions.list(spark, pr).filter(_._1 <= upTo)
    require(versions.nonEmpty, s"no pair versions at $pr")
    requireRepairedRevives(spark, root)
    val raw = Versions.read(spark, pr, versions.map(_._2.toString))
    Versions.maskTombstones(spark, pr,
      Versions.maskTombstones(spark, pr, raw, "id_a", upTo), "id_b", upTo)
  }

  /** This store's takedown/revive verbs pair their markers with
    * component-local repair ([[retract]]'s split/re-election,
    * [[revive]]'s merge/re-election) — a bare [[Versions.revive]] on the
    * assign/pairs roots would resurrect rows under stale labels with no
    * repair delta. Every revive-marker batch `b` must therefore be
    * followed by its repair's version `v<b+1>` on the assign root; the
    * one exemption is the verb's own in-flight window (marker landed,
    * repair delta not yet — `b` is the newest marker AND no later
    * version exists), which the verb itself, or its redelivery, closes.
    * The [[graft.streaming.RetrievalStream.readStats]] torn-window
    * discipline, applied to repair deltas. */
  private def requireRepairedRevives(spark: SparkSession,
      root: String): Unit = {
    val ar = assignRoot(root)
    val rs = (Versions.listRevives(spark, ar) ++
      Versions.listRevives(spark, pairsRoot(root))).map(_._1).distinct
    if (rs.nonEmpty) {
      val versions = Versions.list(spark, ar).map(_._1).toSet
      val newest = rs.max
      val inFlight = (b: Long) =>
        b == newest && !versions.exists(_ > b)
      val unrepaired = rs.filterNot(b => versions(b + 1) || inFlight(b))
      require(unrepaired.isEmpty,
        s"revive markers at batch ${unrepaired.mkString(", ")} under " +
          s"$root have no repair delta — revive through " +
          "ClusterStream.revive (marker + component-local merge repair), " +
          "not a bare Versions.revive")
    }
  }

  /** Assignment slice for a (takedown/batch-sized) cid set: pushed
    * `cid IN` literal when the set is small enough for parquet row-group
    * pruning on a compacted cid-clustered base (the
    * [[NearDupStream.filterBatch]] pushBucketLimit pattern), broadcast
    * join fallback otherwise. `cids` must be materialized (it is read up
    * to `limit + 1` rows). */
  private def membersOf(assigns: DataFrame, cids: DataFrame,
      pushCidLimit: Int = 1024): DataFrame = {
    val some = cids.select(col("cid")).distinct()
      .limit(pushCidLimit + 1).collect().map(_.getLong(0)).toSeq
    if (some.size <= pushCidLimit) assigns.filter(col("cid").isin(some: _*))
    else assigns.join(broadcast(cids.select(col("cid")).distinct()), "cid")
  }

  /** The `foreachBatch` fold: merge one batch of docs (idCol, scoreCol)
    * and its pair delta into the standing state. Per-batch work is
    * batch-sized plus the touched clusters' membership read: endpoints
    * resolve to their cids (cid = min member id, so the merged label is
    * the min over batch ids and touched cids), star contraction runs on
    * the BATCH-LOCAL contracted graph, and only clusters whose label
    * changes are rewritten. The standing corpus never re-clusters. */
  def foldBatch(spark: SparkSession, root: String, idCol: String = "id",
      scoreCol: String = "score", pushCidLimit: Int = 1024,
      lease: Option[Versions.Lease] = None)(
      batchDocs: DataFrame, batchPairs: DataFrame, batchId: Long): Unit = {
    val ar = assignRoot(root); val cr = canonRoot(root)
    val pr = pairsRoot(root)
    Versions.guardAppend(spark, ar, "cluster assignments", batchId,
      "ClusterStream.writeStanding before starting the stream", lease)
    Versions.guardAppend(spark, cr, "cluster canonicals", batchId,
      lease = lease)
    Versions.guardAppend(spark, pr, "cluster pairs", batchId, lease = lease)
    // pairs touching a tombstoned id are masked on BOTH endpoints
    // (broadcast, takedown-sized) — an upstream pair generator that has
    // not seen the takedown yet could otherwise make a deleted doc look
    // never-seen: it would label itself, become a graph node, and merge
    // two live clusters through a deleted doc (ADVICE r15 #2). The
    // masked fold equals the fold over the retained-pair stream.
    // The two batch-sized materializations are independent — overlap
    // them (guide §2.6) so the trigger pays one action's wall, not two.
    // bp's emptiness probe rides INSIDE its own thunk (r18): it is one
    // more cheap action over the just-checkpointed frame, and running it
    // under bd's overlapped wall removes a serialized driver action from
    // every fold trigger.
    val staged = graft.core.Par.eval(Seq[() => (DataFrame, Boolean)](
      () => {
        val d = batchDocs
          .select(col(idCol).as("id"),
            col(scoreCol).cast("double").as("score"))
          .localCheckpoint(true)
        (d, false)
      },
      () => {
        val d = Versions.maskTombstones(spark, ar,
            Versions.maskTombstones(spark, ar,
              batchPairs.select(col("id_a"), col("id_b")), "id_a", batchId),
            "id_b", batchId)
          .localCheckpoint(true)
        (d, d.isEmpty)
      }))
    val bd = staged(0)._1
    val bp = staged(1)._1
    val v = batchId + 1
    if (staged(1)._2) {
      // no connectivity: every batch doc is a fresh singleton. The three
      // delta writes are independent (distinct roots, redelivery
      // overwrites any completion subset) — overlap them (guide §2.6).
      graft.core.Par.run(
        () => bd.select(col("id"), col("id").as("cid"), col("score"),
            SteadyLit.steadyLong(v).as("__v"))
          .write.mode("overwrite").parquet(s"$ar/v$v"),
        () => bd.select(col("id").as("cid"), col("id").as("keep_id"),
            col("score"), lit(1L).as("n_members"), SteadyLit.steadyLong(v).as("__v"))
          .write.mode("overwrite").parquet(s"$cr/v$v"),
        () => bp.write.mode("overwrite").parquet(s"$pr/v$v"))
      return
    }
    val assigns = readAssignments(spark, root, upTo = batchId)
    // old endpoints (not in this batch) resolve to their cluster ids;
    // a doc the store has never seen (pair against a not-yet-folded
    // singleton) falls back to labeling itself
    val pairDocs = bp.select(col("id_a").as("id"))
      .unionAll(bp.select(col("id_b").as("id"))).distinct()
    val oldCids = pairDocs
      .join(bd.select(col("id")), Seq("id"), "left_anti")
      .join(assigns.select(col("id"), col("cid")), Seq("id"), "left")
      .select(col("id"), coalesce(col("cid"), col("id")).as("cid"))
      .localCheckpoint(true)
    // contract the batch graph: new ids stay nodes, old ids become their
    // cluster's node — the batch-local graph is batch-sized
    val mapped = bp
      .join(oldCids.select(col("id").as("id_a"), col("cid").as("__ca")),
        Seq("id_a"), "left")
      .join(oldCids.select(col("id").as("id_b"), col("cid").as("__cb")),
        Seq("id_b"), "left")
      .select(coalesce(col("__ca"), col("id_a")).as("id_a"),
        coalesce(col("__cb"), col("id_b")).as("id_b"))
    // ccStar's result is a cheap join over its own internally-checkpointed
    // edge/node sets — re-deriving it per consumer costs less than the
    // extra materialization job an eager checkpoint would add (r17)
    val comp = Dedup.connectedComponentsStar(mapped)
    // touched clusters → their merged label: min over member doc ids ==
    // min over (batch ids, touched cids) because cid = min member id.
    // r18 (the fold's critical chain): touched is batch-bounded (one row
    // per cid a pair endpoint resolves to), so ONE driver pull replaces
    // the old eager checkpoint PLUS membersOf's separate cid collect —
    // two serialized actions become one — and every downstream join sees
    // a LocalRelation (smaller plans, the pushed `cid IN` comes free).
    // A touched set wider than pushCidLimit keeps the distributed path.
    val touchedPlan = comp
      .join(oldCids.select(col("cid").as("id")).distinct(), Seq("id"),
        "left_semi")
      .select(col("id").as("cid"), col("component").as("__nl"))
    val touchedRows = touchedPlan.limit(pushCidLimit + 1).collect()
    val (touched, touchedMembers) =
      if (touchedRows.length <= pushCidLimit) {
        import spark.implicits._
        val local = touchedRows.map(r => (r.getLong(0), r.getLong(1)))
          .toSeq.toDF("cid", "__nl")
        val cids = touchedRows.map(_.getLong(0)).toSeq
        (local, assigns.filter(col("cid").isin(cids: _*)))
      } else {
        val ck = touchedPlan.localCheckpoint(true)
        (ck, membersOf(assigns, ck, pushCidLimit))
      }
    val oldMembers = touchedMembers
      .join(broadcast(touched), Seq("cid"))
      .select(col("id"), col("cid"), col("score"), col("__nl"))
      .localCheckpoint(true)
    val newInPairs = bd.join(pairDocs, Seq("id"), "left_semi")
      .join(comp.select(col("id"), col("component").as("__nl")), Seq("id"))
      .select(col("id"), col("score"), col("__nl"))
    val newSingles = bd.join(pairDocs, Seq("id"), "left_anti")
      .select(col("id"), col("score"), col("id").as("__nl"))
    // single consumer (the election below) — no checkpoint needed
    val allMembers = oldMembers.select(col("id"), col("score"), col("__nl"))
      .unionAll(newInPairs).unionAll(newSingles)
    // the three delta writes are independent (distinct roots, redelivery
    // overwrites any completion subset) — overlap them (guide §2.6);
    // their shared inputs (bd/bp/oldCids/touched/oldMembers) are all
    // eagerly checkpointed above, so the concurrent plans re-derive only
    // the cheap final joins
    graft.core.Par.run(
      // assignment delta: every new doc + every relabeled old member
      () => oldMembers.filter(col("cid") =!= col("__nl"))
        .select(col("id"), col("__nl").as("cid"), col("score"),
          SteadyLit.steadyLong(v).as("__v"))
        .unionAll(newInPairs.unionAll(newSingles)
          .select(col("id"), col("__nl").as("cid"), col("score"),
            SteadyLit.steadyLong(v).as("__v")))
        .write.mode("overwrite").parquet(s"$ar/v$v"),
      // canonical delta: re-elect every touched label, kill merged-away
      // ones
      () => electCanon(allMembers.select(col("id"), col("__nl").as("cid"),
          col("score")), v)
        .unionByName(touched.filter(col("cid") =!= col("__nl"))
          .select(col("cid"), lit(-1L).as("keep_id"), lit(0.0).as("score"),
            lit(0L).as("n_members"), SteadyLit.steadyLong(v).as("__v")))
        .write.mode("overwrite").parquet(s"$cr/v$v"),
      () => bp.write.mode("overwrite").parquet(s"$pr/v$v"))
  }

  /** Takedown + component-local repair (the [[Versions.tombstone]]
    * contract, plus the cluster-specific consequences the generic marker
    * cannot express): markers land on the assign + pairs roots, then the
    * AFFECTED components — and only those — are re-solved over their
    * retained pairs. Splits produce new min-id labels; members isolated
    * by the deletion become singletons; canonicals re-elect (the deleted-
    * canonical case); labels with no retained members die. Occupies the
    * `batchId + 1` version slot on the assign/canon roots — run it inside
    * a trigger that does not also fold (its own maintenance batch), like
    * every single-writer snapshot step. */
  def retract(spark: SparkSession, root: String, ids: DataFrame,
      batchId: Long, pushCidLimit: Int = 1024,
      lease: Option[Versions.Lease] = None): Unit = {
    val ar = assignRoot(root); val cr = canonRoot(root)
    val v = batchId + 1
    // same lineage guards as the fold: a fresh checkpoint replaying an
    // old batch over newer deltas would fork the repair's lineage
    Versions.guardAppend(spark, ar, "cluster assignments", batchId,
      "ClusterStream.writeStanding before retracting", lease)
    Versions.guardAppend(spark, cr, "cluster canonicals", batchId,
      lease = lease)
    val del = ids.toDF("id").select(col("id").cast("long").as("id"))
      .filter(col("id").isNotNull).distinct().localCheckpoint(true)
    // affected components: the deleted docs' rows must stay visible to
    // THIS resolution even on redelivery (this batch's own marker may
    // already exist), so the mask stops strictly before batchId
    val affected = readAssignmentsMasked(spark, root, upTo = batchId,
        maskUpTo = batchId - 1)
      .join(broadcast(del), Seq("id"), "left_semi")
      .select(col("cid")).distinct().localCheckpoint(true)
    // independent marker roots (the repair below reads both post-marker
    // views) — overlap the two marker writes (guide §2.6)
    graft.core.Par.run(
      () => Versions.tombstoneFrom(spark, ar, del, batchId, lease),
      () => Versions.tombstoneFrom(spark, pairsRoot(root), del, batchId,
        lease))
    // retained members and retained intra-component pairs (both reads are
    // masked now); connectivity re-solves component-locally
    repairComponents(spark, root, affected, batchId, pushCidLimit)
  }

  /** Un-delete + component-local MERGE repair (VERDICT r16 next #4 —
    * the store's own revive path; the generic [[Versions.revive]] is
    * refused on read because it cannot invert [[retract]]'s paired
    * repair): `r<batchId>` markers land on the assign + pairs roots (the
    * ORIGINAL rows return — [[Versions.revive]]'s dead-as-of check and
    * every other contract clause apply per root), then the AFFECTED
    * components — the revived docs' own labels plus every component a
    * revived pair reaches — re-solve over the now-retained pairs: the
    * returning doc re-merges into its old neighborhood (possibly
    * bridging components that split while it was dead), min-id labels
    * rewrite (a small revived id can RE-FLIP its cluster's label and
    * canonical), elections re-run, labels that merge away die. Work is
    * component-sized, exactly [[retract]]'s repair posture.
    *
    * Unlike [[retract]] (whose own markers HIDE its inputs, forcing the
    * mask bound to `batchId - 1`), the repair here reads the PLAIN
    * post-revive view: its own markers REVEAL the rows it must re-merge,
    * so a redelivered revive resolves the same state and overwrites the
    * same deltas. Occupies the `batchId + 1` version slot — run it in
    * its own maintenance trigger, like [[retract]].
    *
    * Revive is NOT re-ingest: pairs the doc acquired no rows for while
    * dead (a batch probed the band index during the takedown window) do
    * not reappear — the doc reconnects through the pairs it had when it
    * was retracted plus anything folded against it later. New content
    * under the same external key still routes through a fresh ingest id
    * ([[Takedown.guardReingest]]). */
  def revive(spark: SparkSession, root: String, ids: DataFrame,
      batchId: Long, pushCidLimit: Int = 1024,
      lease: Option[Versions.Lease] = None): Unit = {
    val ar = assignRoot(root); val pr = pairsRoot(root)
    Versions.guardAppend(spark, ar, "cluster assignments", batchId,
      "ClusterStream.writeStanding before reviving", lease)
    Versions.guardAppend(spark, canonRoot(root), "cluster canonicals",
      batchId, lease = lease)
    val rel = ids.toDF("id").select(col("id").cast("long").as("id"))
      .filter(col("id").isNotNull).distinct().localCheckpoint(true)
    // independent marker roots — overlap the two revive-marker writes
    // (guide §2.6); the repair below reads both post-marker views
    graft.core.Par.run(
      () => Versions.revive(spark, ar, rel, batchId, lease),
      () => Versions.revive(spark, pr, rel, batchId, lease))
    // seeds: the revived docs + every endpoint of a pair touching them
    // (a revived pair can merge the doc's old neighborhood with whatever
    // its partners drifted into while it was dead) — their components,
    // and only those, re-solve
    val pairs = readPairs(spark, root, upTo = batchId)
    val touching = pairs
      .join(broadcast(rel.withColumnRenamed("id", "id_a")), Seq("id_a"),
        "left_semi")
      .unionAll(pairs.join(broadcast(rel.withColumnRenamed("id", "id_b")),
        Seq("id_b"), "left_semi"))
      .localCheckpoint(true)
    val seeds = touching.select(col("id_a").as("id"))
      .unionAll(touching.select(col("id_b").as("id")))
      .unionAll(rel).distinct()
    val affected = readAssignments(spark, root, upTo = batchId)
      .join(broadcast(seeds), Seq("id"), "left_semi")
      .select(col("cid")).distinct().localCheckpoint(true)
    repairComponents(spark, root, affected, batchId, pushCidLimit)
  }

  /** The shared component-local re-solve behind [[retract]] and
    * [[revive]]: read the affected cids' members and their retained
    * intra-member pairs from the post-marker view, re-run star
    * contraction, rewrite relabeled members as the `batchId + 1` assign
    * delta, re-elect every surviving label and write dead rows for
    * labels that no longer exist. */
  private def repairComponents(spark: SparkSession, root: String,
      affected: DataFrame, batchId: Long, pushCidLimit: Int): Unit = {
    val ar = assignRoot(root); val cr = canonRoot(root)
    val v = batchId + 1
    val members = membersOf(readAssignments(spark, root, upTo = batchId),
        affected, pushCidLimit)
      .localCheckpoint(true)
    val memberIds = broadcast(members.select(col("id")))
    val keptPairs = readPairs(spark, root, upTo = batchId)
      .join(memberIds.withColumnRenamed("id", "id_a"), Seq("id_a"),
        "left_semi")
      .join(memberIds.withColumnRenamed("id", "id_b"), Seq("id_b"),
        "left_semi")
      .localCheckpoint(true)
    val labels =
      if (keptPairs.isEmpty) spark.emptyDataFrame
        .select(lit(0L).as("id"), lit(0L).as("component")).limit(0)
      else Dedup.connectedComponentsStar(keptPairs)
    val resolved = members
      .join(labels, Seq("id"), "left")
      .select(col("id"), col("cid"),
        coalesce(col("component"), col("id")).as("__nl"), col("score"))
      .localCheckpoint(true)
    val newLabels = resolved.select(col("__nl").as("cid")).distinct()
    // the two repair-delta writes are independent (distinct roots,
    // redelivery re-resolves and overwrites both) — overlap them
    // (guide §2.6); `resolved` is checkpointed above
    graft.core.Par.run(
      () => resolved.filter(col("cid") =!= col("__nl"))
        .select(col("id"), col("__nl").as("cid"), col("score"),
          SteadyLit.steadyLong(v).as("__v"))
        .write.mode("overwrite").parquet(s"$ar/v$v"),
      () => electCanon(resolved.select(col("id"), col("__nl").as("cid"),
          col("score")), v)
        .unionByName(affected.join(newLabels, Seq("cid"), "left_anti")
          .select(col("cid"), lit(-1L).as("keep_id"), lit(0.0).as("score"),
            lit(0L).as("n_members"), SteadyLit.steadyLong(v).as("__v")))
        .write.mode("overwrite").parquet(s"$cr/v$v"))
  }

  /** Fold all three roots' deltas into fresh bases: assignments back to
    * one row per id (newest wins), tombstoned docs dropped physically and
    * the base CLUSTERED by `cid` (the fold's membership reads prune by a
    * pushed cid predicate); canonicals to one live row per cid; pairs with
    * both-endpoint tombstone drops (the marker set is applied to BOTH
    * columns before the id_a-keyed consumption — a one-column drop would
    * resurrect the id_b rows once the markers are consumed). */
  def compactStore(spark: SparkSession, root: String, upTo: Long,
      lease: Option[Versions.Lease] = None): Unit = {
    val newestPerId: DataFrame => DataFrame = { df =>
      val w = Window.partitionBy(col("id")).orderBy(col("__v").desc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    val newestPerCid: DataFrame => DataFrame = { df =>
      val w = Window.partitionBy(col("cid")).orderBy(col("__v").desc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1 && col("n_members") > 0).drop("__rn")
    }
    val pr = pairsRoot(root)
    // allowSingle on all three roots: a marker-only history (retract/
    // revive with no interleaved folds) leaves one version + markers to
    // consume, and a crash between the per-root rewrites must leave the
    // re-run convergent (the RetrievalStream.compactStore discipline).
    // The three per-root rewrites are independent (crash recovery is
    // already "re-run converges per root") — overlap them (guide §2.6).
    graft.core.Par.run(
      () => Versions.compact(spark, assignRoot(root), upTo, newestPerId,
        tombstoneIdCol = Some("id"), clusterBy = Seq("cid"),
        allowSingle = true, lease = lease),
      () => Versions.compact(spark, canonRoot(root), upTo, newestPerCid,
        clusterBy = Seq("cid"), allowSingle = true, lease = lease),
      () => {
        // deadSet, not the raw marker union: a revived id's pair rows must
        // survive the physical fold (newest-verb-wins, the
        // RetrievalStream.compactStore discipline)
        val delIds = Versions.deadSet(spark, pr, upTo)
          .map(_.localCheckpoint(true))
        Versions.compact(spark, pr, upTo,
          df => delIds.fold(df)(d =>
            df.join(broadcast(d.withColumnRenamed("id", "id_b")),
              Seq("id_b"), "left_anti")),
          tombstoneIdCol = Some("id_a"), allowSingle = true, lease = lease)
      })
  }
}
