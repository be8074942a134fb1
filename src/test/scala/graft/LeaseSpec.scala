package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.{ClusterStream, RetrievalStream, Takedown, Versions}
import graft.streaming.Takedown.Target

/** The single-writer/lease contract (VERDICT r16 missing #1): every store
  * correctness property rests on deterministic batch-id-named overwrites
  * from ONE writer per root. This matrix drives the real interleavings a
  * deployment hits — a maintenance compaction racing a live append, two
  * streams on one root, a hand-run takedownAll beside a leased ingest —
  * and pins that each either runs under the current lease or fails loud,
  * never silently racing. */
class LeaseSpec extends SparkSpec {

  private def docs: DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  private def freshBm25(): String = {
    val root = java.nio.file.Files.createTempDirectory("lease_bm_").toString
    RetrievalStream.writeStanding(spark, root,
      docs.filter(col("doc_id") < 30))
    root
  }

  test("an unleased root keeps the legacy behavior; once leased, every " +
      "mutating verb refuses without the holder's lease and accepts it " +
      "across all the store's subroots") {
    val root = freshBm25()
    // legacy: no lease anywhere, unleased verbs work
    RetrievalStream.appendBatch(spark, root)(
      docs.filter(col("doc_id").between(30, 34)), 0L)

    val lease = Versions.acquireLease(spark, root, "ingest-a")
    // two-streams-on-one-root: the second stream (no lease) must refuse
    val e1 = intercept[IllegalArgumentException] {
      RetrievalStream.appendBatch(spark, root)(
        docs.filter(col("doc_id").between(35, 39)), 1L)
    }
    assert(e1.getMessage.contains("lease-protected"), e1.getMessage)
    // an unleased hand-run sweep beside the leased ingest: refuse too
    val e2 = intercept[IllegalArgumentException] {
      RetrievalStream.tombstone(spark, root, Seq(0L), 1L)
    }
    assert(e2.getMessage.contains("lease-protected"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      RetrievalStream.compactStore(spark, root, upTo = 0L)
    }
    assert(e3.getMessage.contains("lease-protected"), e3.getMessage)

    // the holder runs everything — the ONE store-root lease covers the
    // post/stats/dlen subroots (append, takedown, maintenance compaction
    // between triggers: the single-writer shape of a real deployment)
    RetrievalStream.appendBatch(spark, root, lease = Some(lease))(
      docs.filter(col("doc_id").between(35, 39)), 1L)
    RetrievalStream.tombstone(spark, root, Seq(0L, 31L), 2L, Some(lease))
    RetrievalStream.compactStore(spark, root, upTo = 2L, Some(lease))
    val terms = Seq("data", "merge", "hash", "scan")
    val retained = docs.filter(col("doc_id") < 40 &&
      !col("doc_id").isin(0L, 31L))
    val want = graft.operators.Retrieval
      .bm25TopK(retained, "doc_id", "text", terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(RetrievalStream.bm25TopK(spark, root, terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq === want)

    // release → the root returns to unleased legacy behavior
    Versions.releaseLease(spark, lease)
    RetrievalStream.appendBatch(spark, root)(
      docs.filter(col("doc_id").between(40, 44)), 3L)
  }

  test("epoch fencing: a second acquire takes the root over and the old " +
      "holder's next mutation fails loud instead of racing") {
    val root = freshBm25()
    val a = Versions.acquireLease(spark, root, "stream-a")
    RetrievalStream.appendBatch(spark, root, lease = Some(a))(
      docs.filter(col("doc_id").between(30, 34)), 0L)

    val b = Versions.acquireLease(spark, root, "maint-b")
    assert(b.epoch === a.epoch + 1)
    // the fenced stream stops loud — the compaction-racing-append hazard
    // becomes a refusal, not a torn version boundary
    val e = intercept[IllegalArgumentException] {
      RetrievalStream.appendBatch(spark, root, lease = Some(a))(
        docs.filter(col("doc_id").between(35, 39)), 1L)
    }
    assert(e.getMessage.contains("FENCED"), e.getMessage)
    // the new holder compacts and keeps appending under its own lease
    RetrievalStream.compactStore(spark, root, upTo = 0L, Some(b))
    RetrievalStream.appendBatch(spark, root, lease = Some(b))(
      docs.filter(col("doc_id").between(35, 39)), 1L)
    // a released lease cannot mutate either
    Versions.releaseLease(spark, b)
    val e2 = intercept[IllegalArgumentException] {
      RetrievalStream.appendBatch(spark, root, lease = Some(b))(
        docs.filter(col("doc_id").between(40, 44)), 2L)
    }
    assert(e2.getMessage.contains("released"), e2.getMessage)
  }

  test("takedownAll beside a leased ingest: an unleased Target refuses " +
      "mid-fan-out (journal stays recoverable), the leased Target form " +
      "finishes; the cluster store's verb threads the lease too") {
    import spark.implicits._
    val bm = freshBm25()
    val cs = java.nio.file.Files.createTempDirectory("lease_cs_").toString
    val standing = docs.filter(col("doc_id") < 30)
      .select(col("doc_id").as("id"), lit(1.0).as("score"))
    ClusterStream.writeStanding(spark, cs, standing,
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    val bmLease = Versions.acquireLease(spark, bm, "ingest-bm")
    val csLease = Versions.acquireLease(spark, cs, "ingest-cs")
    val journal = java.nio.file.Files.createTempDirectory("lease_j_")
      .toString
    val sweep = docs.filter(col("doc_id") < 3).select(col("doc_id"))

    val e = intercept[IllegalArgumentException] {
      Takedown.takedownAll(spark, journal, sweep, 1L, Seq(
        Target("bm25",
          (s, ids, b) => RetrievalStream.tombstoneFrom(s, bm, ids, b)),
        Target("cluster",
          (s, ids, b) => ClusterStream.retract(s, cs, ids, b))))
    }
    assert(e.getMessage.contains("lease-protected"), e.getMessage)
    assert(Takedown.incomplete(spark, journal) === Seq(1L))

    // recovery with the holders' leases converges from the journal
    Takedown.takedownAll(spark, journal, sweep, 1L, Seq(
      Target("bm25", (s, ids, b) =>
        RetrievalStream.tombstoneFrom(s, bm, ids, b, Some(bmLease))),
      Target("cluster", (s, ids, b) =>
        ClusterStream.retract(s, cs, ids, b, lease = Some(csLease)))))
    assert(Takedown.incomplete(spark, journal).isEmpty)
    val kept = ClusterStream.readAssignments(spark, cs)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === (3L until 30L).toSet)
    // leased foldBatch keeps streaming after the sweep
    ClusterStream.foldBatch(spark, cs, lease = Some(csLease))(
      docs.filter(col("doc_id").between(30, 34))
        .select(col("doc_id").as("id"), lit(1.0).as("score")),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), 2L)
    assert(ClusterStream.readAssignments(spark, cs).count() === 32)
  }

  test("withLease covers stores that don't thread a lease parameter: a " +
      "containment store on a leased root appends/retracts/compacts " +
      "inside the holder's scope, refuses outside it, and a fenced held " +
      "lease refuses too") {
    import graft.operators.Dedup
    import graft.streaming.ContainmentStream
    val root = java.nio.file.Files.createTempDirectory("lease_ct_").toString
    val setsOf = (df: DataFrame) =>
      Dedup.jaccardShingleSets(df, "doc_id", "text")
    ContainmentStream.writeStanding(spark, root,
      docs.filter(col("doc_id") < 30), setsOf)
    val l = Versions.acquireLease(spark, root, "ingest-ct")
    // outside the scope: refused (the two-streams shape)
    val e = intercept[IllegalArgumentException] {
      ContainmentStream.filterBatch(spark, root, s"$root.out", setsOf,
        threshold = 0.6)(docs.filter(col("doc_id").between(30, 34)), 0L)
    }
    assert(e.getMessage.contains("lease-protected"), e.getMessage)
    // inside: the full verb set works through the held lease
    Versions.withLease(l) {
      ContainmentStream.filterBatch(spark, root, s"$root.out", setsOf,
        threshold = 0.6)(docs.filter(col("doc_id").between(30, 34)), 0L)
      ContainmentStream.tombstone(spark, root, Seq(1L, 31L), 1L)
      ContainmentStream.compactStore(spark, root, upTo = 1L)
    }
    val ids = ContainmentStream.readIndex(spark, root)
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids.contains(30L) && !ids.contains(1L) && !ids.contains(31L))
    // a fenced held lease refuses exactly like an explicit one
    Versions.acquireLease(spark, root, "maint-takeover")
    val e2 = intercept[IllegalArgumentException] {
      Versions.withLease(l) {
        ContainmentStream.tombstone(spark, root, Seq(2L), 2L)
      }
    }
    assert(e2.getMessage.contains("FENCED"), e2.getMessage)

    // the SNAPSHOT corpus store inherits the same gate (its merge
    // rebases on the newest earlier version — interleaved writers
    // would silently drop rows)
    import graft.streaming.CorpusMaintenance
    val corp = java.nio.file.Files.createTempDirectory("lease_corp_")
      .toString
    docs.filter(col("doc_id") < 30).write.parquet(s"$corp/v0")
    val cl = Versions.acquireLease(spark, corp, "corpus-w")
    val e3 = intercept[IllegalArgumentException] {
      CorpusMaintenance.upsertBatch(spark, corp, Seq("doc_id"))(
        docs.filter(col("doc_id").between(30, 34)), 0L)
    }
    assert(e3.getMessage.contains("lease-protected"), e3.getMessage)
    Versions.withLease(cl) {
      CorpusMaintenance.upsertBatch(spark, corp, Seq("doc_id"))(
        docs.filter(col("doc_id").between(30, 34)), 0L)
      CorpusMaintenance.deleteBatch(spark, corp, Seq("doc_id"))(
        docs.filter(col("doc_id") === 2).select("doc_id"), 1L)
      CorpusMaintenance.vacuum(spark, corp)
    }
    val corpIds = spark.read
      .parquet(CorpusMaintenance.latest(spark, corp).get)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(corpIds.contains(30L) && !corpIds.contains(2L))
  }

  test("lease hygiene: writerId path tokens, cross-root leases, and " +
      "acquire bookkeeping") {
    val root = java.nio.file.Files.createTempDirectory("lease_h_").toString
    intercept[IllegalArgumentException] {
      Versions.acquireLease(spark, root, "bad/writer")
    }
    intercept[IllegalArgumentException] {
      Versions.acquireLease(spark, root, "")
    }
    val l = Versions.acquireLease(spark, root, "w_1")
    assert(Versions.currentLease(spark, root) === Some((0L, "w_1")))
    // a lease on root X does not cover an unrelated root Y
    val other = java.nio.file.Files.createTempDirectory("lease_h2_")
      .toString
    val e = intercept[IllegalArgumentException] {
      Versions.checkWriter(spark, other, Some(l))
    }
    assert(e.getMessage.contains("does not cover"), e.getMessage)
    Versions.releaseLease(spark, l)
    assert(Versions.currentLease(spark, root).isEmpty)
  }
}
