package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** The reference framework's entire data-plane capability, as one typed facade.
  *
  * `nikiwiles/FSharp-MapReduce` is a generic batch MapReduce framework whose
  * fixed pipeline is: paginated source → user flatMap to key/value pairs →
  * consistent-hash shuffle → per-key fold into a worker-local dictionary →
  * disjoint union of the partials → user sink. Slot-for-slot mapping:
  *
  *   - load fn `int -> int -> obj list` (`/root/reference/Loader.fs:17`)
  *     → [[MapReduceJob.source]] (any `Dataset`, typically a parquet scan)
  *   - map fn `obj -> KeyValuePair<obj,obj> list` (`/root/reference/Worker.fs:20`)
  *     → [[MapReduceJob.mapFn]] (`I => IterableOnce[(K, V)]`)
  *   - reduce fn `(pair, dict) -> dict` (`/root/reference/Worker.fs:23,89-96`)
  *     → [[MapReduceJob.reduceFn]] (`(V, V) => V`). The reference's fold is
  *       order-sensitive but its async shuffle makes arrival order
  *       nondeterministic, so only commutative-associative folds were ever
  *       deterministic there (SURVEY.md §2 notes); we require exactly that.
  *   - merge partials via LINQ disjoint union (`/root/reference/Orchestrator.fs:163-175`)
  *     → Spark's final aggregation after the exchange (automatic)
  *   - handle-results fn (`/root/reference/Orchestrator.fs:55,175`)
  *     → [[MapReduceJob.runWithSink]] / [[MapReduceJob.collectResults]]
  *
  * Everything else in the reference — function pickling + broadcast
  * (`Orchestrator.fs:123-132`), round-robin dealing (`Orchestrator.fs:112`),
  * receipt-counted flow control (`Orchestrator.fs:65-88,142-163`) — is
  * subsumed by Spark task serialization and the DAG scheduler.
  *
  * Scale notes (100 TB): unlike the reference, which ships every KV pair
  * across the wire before any reduction (`Worker.fs:81` — no map-side
  * combine), `reduceGroups`/`Aggregator` plans a partial aggregate before the
  * exchange and a final one after, so shuffle volume is O(distinct keys), not
  * O(records). State spills via Tungsten instead of living in one in-memory
  * `Dictionary` per worker (`Worker.fs:32`), and lineage/retry replaces the
  * reference's at-most-once messaging.
  */
final case class MapReduceJob[I, K, V](
    source: SparkSession => Dataset[I],
    mapFn: I => IterableOnce[(K, V)],
    reduceFn: (V, V) => V)(
    implicit kEnc: Encoder[K], vEnc: Encoder[V], kvEnc: Encoder[(K, V)]) {

  /** The whole reference pipeline as a lazy Dataset: flatMap → hash exchange
    * (Spark's `HashPartitioning` stands in for the `ConsistentHashingGroup`
    * router, `/root/reference/Worker.fs:35-43`) → partial + final fold. */
  def run(spark: SparkSession): Dataset[(K, V)] =
    source(spark)
      .flatMap(mapFn)
      .groupByKey(_._1)
      .mapValues(_._2)
      .reduceGroups(reduceFn)

  /** Reference result-delivery parity: gather all per-key results into one
    * driver-side map (`/root/reference/Orchestrator.fs:171-175`). Only for
    * small result sets — prefer [[runWithSink]] with a distributed write. */
  def collectResults(spark: SparkSession): Map[K, V] =
    run(spark).collect().toMap

  /** handle-results slot (`/root/reference/Orchestrator.fs:55,175`): the sink
    * receives the lazy result Dataset and decides how to materialize it. */
  def runWithSink(spark: SparkSession)(sink: Dataset[(K, V)] => Unit): Unit =
    sink(run(spark))

  /** The same pipeline on the RDD API (`flatMap → reduceByKey`) — the other
    * direct Spark expression of the reference's surface. `reduceByKey` is a
    * map-side-combining shuffle, i.e. exactly [[run]]'s partial+final fold
    * without Catalyst. Exists for API parity and as the escape hatch for
    * per-partition imperative jobs; results are identical (asserted in
    * tests). */
  def runRdd(spark: SparkSession)(
      implicit kt: scala.reflect.ClassTag[K],
      vt: scala.reflect.ClassTag[V]): Map[K, V] =
    source(spark).rdd
      .flatMap(mapFn)
      .reduceByKey(reduceFn)
      .collect().toMap
}

/** The general form of the reference's reduce slot: a fold into an arbitrary
  * accumulator type `B` (the reference folds into `Dictionary<obj,obj>`,
  * `/root/reference/Worker.fs:23,32`), expressed as a Spark `Aggregator` so
  * Catalyst plans partial aggregation + exchange + final merge.
  *
  * `seqOp` is the reference's `(pair, state) -> state`; `combOp` is the merge
  * the reference only performs once, driver-side, via LINQ `Union`
  * (`/root/reference/Orchestrator.fs:166-168`) — here it runs distributed.
  */
object FoldAggregator {
  def apply[V, B, O](zero0: B, seqOp: (B, V) => B, combOp: (B, B) => B,
      finishFn: B => O)(
      implicit bEnc: Encoder[B], oEnc: Encoder[O]): Aggregator[V, B, O] =
    new Aggregator[V, B, O] {
      override def zero: B = zero0
      override def reduce(b: B, v: V): B = seqOp(b, v)
      override def merge(b1: B, b2: B): B = combOp(b1, b2)
      override def finish(b: B): O = finishFn(b)
      override def bufferEncoder: Encoder[B] = bEnc
      override def outputEncoder: Encoder[O] = oEnc
    }

  /** Frequency count — the one aggregate the reference ships
    * (`/root/reference/Example-Job.fs:57-61`). */
  def counter[V]: Aggregator[V, Long, Long] =
    apply[V, Long, Long](0L, (b, _) => b + 1, _ + _, identity)(
      Encoders.scalaLong, Encoders.scalaLong)
}
