package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over an embedding column (`array<float>`) — brute-force
  * cosine top-k as the exact baseline, and a random-hyperplane-LSH bucketed
  * variant as the scale path. North-star extensions (SURVEY.md §2c).
  *
  * Scale posture (100 TB):
  *   - The query side is assumed small (ad-hoc probes / a batch of centroid
  *     queries) and is broadcast; the corpus never shuffles for the join.
  *   - Brute force is O(|Q|·|corpus|) dot products but embarrassingly
  *     parallel and scan-shaped — the right baseline, and often the right
  *     answer when |Q| is small.
  *   - The LSH path prunes the corpus per query to matching sign-buckets
  *     across `tables` independent hash tables (union of candidates, exact
  *     rerank). Buckets are computed once per corpus and are joinable —
  *     at scale you'd persist them as a bucketed table and skip the rebuild.
  */
object Similarity {

  /** Exact cosine top-k: for each query vector, the k nearest corpus vectors.
    * Returns (query_id, rank, neighbor_id, sim). Ties broken by neighbor id.
    * `queries` must be broadcast-sized. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Two-phase exact top-k: map-side partial top-k per partition via a
    * bounded-buffer `Aggregator`, merged reduce-side — only k rows per
    * (query, partition) cross the exchange, vs the full |Q|·|corpus| scored
    * set a window sort would shuffle. Same results and tie-break as
    * [[bruteForceTopK]] (asserted in tests); the 100 TB path. */
  def bruteForceTopKTwoPhase(
      queries: DataFrame, corpus: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("sim"))
      .as[(Long, Long, Double)]

    // "less" = better: (sim desc, id asc) — identical tie-break to the
    // window variant
    val betterFirst: Ordering[(Double, Long)] =
      (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    val topK = new org.apache.spark.sql.expressions.Aggregator[
        (Long, Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {
      override def zero: Seq[(Double, Long)] = Vector.empty
      // buffer invariant: sorted best-first, size ≤ k. Bounded insertion —
      // the common case (row worse than the current k-th) is one compare,
      // vs the O(k log k) sort-per-row this replaces; k stays tiny but the
      // per-row kernel is what every corpus row pays at scale.
      private def insert(b: Seq[(Double, Long)], e: (Double, Long)) =
        if (b.size >= k && betterFirst.compare(e, b.last) >= 0) b
        else {
          val i = b.indexWhere(x => betterFirst.compare(e, x) < 0)
          val pos = if (i < 0) b.size else i
          val nb = (b.take(pos) :+ e) ++ b.drop(pos)
          if (nb.size > k) nb.take(k) else nb
        }
      override def reduce(b: Seq[(Double, Long)], r: (Long, Long, Double)) =
        insert(b, (r._3, r._2))
      override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]) =
        b.foldLeft(a)(insert)
      override def finish(b: Seq[(Double, Long)]) = b
      override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
        implicitly[org.apache.spark.sql.Encoder[Seq[(Double, Long)]]]
      override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
        implicitly[org.apache.spark.sql.Encoder[Seq[(Double, Long)]]]
    }

    scored.groupByKey(_._1).agg(topK.toColumn.name("top"))
      .toDF("query_id", "top")
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col._2").as("neighbor_id"), col("col._1").as("sim"))
  }

  /** Corpus bucketed by `tables` independent sign-bit LSH tables of
    * `bits` hyperplanes each: one row per (vector, table). The whole plane
    * bank is evaluated in one pass per row
    * ([[graft.functions.VectorExpressions.hyperplaneBuckets]]). */
  def lshBuckets(
      df: DataFrame, tables: Int, bits: Int, dim: Int, seed: Long,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    df.select(col(idCol).as("id"),
        posexplode(graft.functions.VectorExpressions
          .hyperplaneBuckets(col(vecCol), tables, bits, dim, seed)))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")

  /** Approximate top-k: candidates = corpus vectors sharing any LSH bucket
    * with the query (union over `tables` tables), exact-cosine reranked.
    * Same output shape as [[bruteForceTopK]]; recall < 1 by design.
    *
    * `multiProbe = true` additionally probes, per table, every bucket at
    * Hamming distance ≤ `probeRadius` from the query's bucket (radius 1 =
    * `bits` extra probes; radius 2 adds bits·(bits−1)/2 more). This is the
    * standard multi-probe trade: recall recovers without coarsening the
    * buckets, so `bits` can keep growing with the corpus — at 100 TB the
    * bucket count must scale with corpus size, and widening buckets
    * (fewer bits) would re-grow each bucket toward a corpus scan. Probing
    * expands only the broadcast query side; the corpus index is untouched. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame, k: Int, dim: Int,
      tables: Int = 8, bits: Int = 12, seed: Long = 42L,
      multiProbe: Boolean = false, probeRadius: Int = 1,
      corpusIndex: Option[DataFrame] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(probeRadius >= 1 && probeRadius <= 2, "probeRadius must be 1 or 2")
    // candidate ids only through the bucket join; vectors re-attached after
    // dedup so payloads cross the wire once per surviving candidate.
    // `corpusIndex` (from [[writeLshIndex]]) skips the signature recompute.
    val cb = corpusIndex.getOrElse(
      lshBuckets(corpus, tables, bits, dim, seed, idCol, vecCol))
    val qb0 = lshBuckets(queries, tables, bits, dim, seed, idCol, vecCol)
      .withColumnRenamed("id", "query_id")
    val flips1 = (0 until bits).map(i => 1L << i)
    val flips2 = if (probeRadius < 2) Seq.empty[Long]
      else for { i <- 0 until bits; j <- (i + 1) until bits }
        yield (1L << i) | (1L << j)
    val qb = broadcast(
      if (!multiProbe) qb0
      else qb0.withColumn("bucket", explode(array(
        col("bucket") +: (flips1 ++ flips2).map(m =>
          col("bucket").bitwiseXOR(lit(m))): _*))))
    val candidates = cb.join(qb, Seq("table", "bucket"))
      .filter(col("query_id") =!= col("id"))
      .select(col("query_id"), col("id").as("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val qv = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    candidates.join(qv, "query_id").join(cv, "neighbor_id")
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Deterministic coarse-quantizer centroid bank: a stride-sample of the
    * corpus (k-means-free — one pass, reproducible; swap in trained
    * centroids without touching any plan). Collecting it to the driver is
    * model-fitting, not a data path: `nCells` rows regardless of corpus
    * size. Compute ONCE per corpus and pass to [[ivfTopK]] /
    * [[writeIvfIndex]] — at scale this is part of index build, not probe. */
  def ivfCentroids(corpus: DataFrame, nCells: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      stride: Int = 50): Array[Array[Double]] =
    corpus
      .orderBy(col(idCol)).limit(nCells * stride)   // bounded driver pull
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .collect()
      .sortBy(_.getLong(0))
      .grouped(stride).map(_.head)              // stride-sample every Nth
      .take(nCells)
      .map(_.getSeq[Double](1).toArray)
      .toArray

  /** K-means-refined centroid bank: `iters` distributed Lloyd iterations
    * seeded by the [[ivfCentroids]] stride sample. A stride sample of a
    * clustered (real-corpus) embedding space yields unbalanced cells — some
    * approaching corpus scans at probe time; a few Lloyd rounds move the
    * bank toward the data's actual modes.
    *
    * Each iteration is one corpus scan + one (cell, dim)-keyed aggregation:
    * partial aggregation means at most nCells·dim rows per partition cross
    * the exchange, and the driver only ever holds the model-size bank.
    * Per-dimension sums are decimal-staged, so the refined bank is
    * bit-deterministic under any partitioning/fold order — required because
    * the bank feeds oracle-checked queries from two independent call sites.
    * An emptied cell keeps its previous centroid. */
  def ivfCentroidsTrained(corpus: DataFrame, nCells: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      stride: Int = 50): Array[Array[Double]] = {
    import graft.functions.VectorExpressions.nearestCentroids
    var cents = ivfCentroids(corpus, nCells, idCol, vecCol, stride)
    val vecs = corpus.select(col(vecCol).cast("array<double>").as("v"))
    var it = 0
    while (it < iters) {
      val perDim = vecs
        .select(element_at(nearestCentroids(col("v"), cents, 1), 1).as("cell"),
          posexplode(col("v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("col").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .as("s"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      perDim.foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          r.getDecimal(2).doubleValue() / r.getLong(3)
      }
      cents = next
      it += 1
    }
    cents
  }

  /** Corpus→cell assignment under a centroid bank: (neighbor_id, cv, cell).
    * This is the IVF index relation; persist via [[writeIvfIndex]]. */
  def ivfAssign(corpus: DataFrame, centroids: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorExpressions.nearestCentroids
    corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      element_at(nearestCentroids(col(vecCol), centroids, 1), 1).as("cell"))
  }

  /** IVF (inverted-file) approximate top-k: corpus vectors are assigned to
    * their nearest of `nCells` coarse centroids; a query probes its `nProbe`
    * nearest cells and exact-reranks only those vectors. Pass `centroids`
    * (ideally [[ivfCentroidsTrained]]) so repeated probes skip model
    * fitting, and `corpusIndex` (from [[writeIvfIndex]]) to skip cell
    * assignment. A `corpusIndex` REQUIRES the centroid bank it was built
    * with: recomputing a bank here could assign query probes under different
    * centroids than the index cells and silently collapse recall. */
  def ivfTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4,
      centroids: Option[Array[Array[Double]]] = None,
      corpusIndex: Option[DataFrame] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorExpressions.nearestCentroids
    require(corpusIndex.isEmpty || centroids.isDefined,
      "corpusIndex requires the centroid bank it was built with — pass " +
        "`centroids` (a recomputed bank would mis-assign query probes)")
    val cents = centroids.getOrElse(ivfCentroids(corpus, nCells, idCol, vecCol))
    val assigned = corpusIndex.getOrElse(ivfAssign(corpus, cents, idCol, vecCol))
    val probes = broadcast(queries.select(col(idCol).as("query_id"),
        col(vecCol).as("qv"),
        explode(nearestCentroids(col(vecCol), cents, nProbe)).as("cell")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    assigned.join(probes, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Product-quantization codebooks: the vector dimension is split into `m`
    * contiguous subspaces, each trained to its own `nCodes`-codeword bank by
    * the same decimal-staged (bit-deterministic) Lloyd machinery as
    * [[ivfCentroidsTrained]] — all m subspaces train together in one scan +
    * one (subspace, code, dim)-keyed partial aggregation per iteration.
    * Bank shape m × nCodes × (dim/m): model-size. Seeds are a stride sample
    * sliced per subspace; an emptied codeword keeps its previous value.
    *
    * PQ is the memory-scale ANN path: a 100 TB float corpus compresses to
    * m small codes per vector (e.g. 64 × f32 → 8 × int ≈ 32× smaller), so
    * the scored relation fits where raw vectors cannot. */
  def pqTrain(corpus: DataFrame, m: Int = 8, nCodes: Int = 16, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    import graft.functions.VectorExpressions.pqCodes
    val sample = corpus
      .orderBy(col(idCol)).limit(nCodes * 50)
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .collect()
      .sortBy(_.getLong(0))
      .grouped(50).map(_.head)
      .take(nCodes)
      .map(_.getSeq[Double](1).toArray)
      .toArray
    require(sample.nonEmpty, "empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    var banks: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => sample.map(_.slice(j * subDim, (j + 1) * subDim)))
    val vecs = corpus.select(col(vecCol).cast("array<double>").as("v"))
    var it = 0
    while (it < iters) {
      val perDim = vecs
        .select(pqCodes(col("v"), banks).as("codes"), posexplode(col("v")))
        .select((col("pos") / subDim).cast("int").as("j"),
          element_at(col("codes"), (col("pos") / subDim).cast("int") + 1)
            .as("code"),
          (col("pos") % subDim).as("pos_in"),
          col("col").as("x"))
        .groupBy(col("j"), col("code"), col("pos_in"))
        .agg(sum(col("x").cast(org.apache.spark.sql.types.DecimalType(38, 18)))
          .as("s"), count(lit(1)).as("n"))
        .collect()
      val next = banks.map(_.map(_.clone()))
      perDim.foreach { r =>
        next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getDecimal(3).doubleValue() / r.getLong(4)
      }
      banks = next
      it += 1
    }
    banks
  }

  /** The compressed PQ index relation: (neighbor_id, codes). Persist like
    * any parquet table — at scale this is what replaces the raw vectors in
    * the scoring scan. */
  def pqEncode(corpus: DataFrame, banks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.select(col(idCol).as("neighbor_id"),
      graft.functions.VectorExpressions.pqCodes(col(vecCol), banks).as("codes"))

  /** PQ approximate top-k: score every corpus vector from its RECONSTRUCTED
    * form (codeword concatenation — the full-corpus scan touches only the
    * m-int codes column), keep the `k · refine` best candidates per query,
    * then exact-rerank just those against the true vectors. Same output
    * shape and tie-break as [[bruteForceTopK]]. */
  def pqTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      banks: Array[Array[Array[Double]]], refine: Int = 32,
      codes: Option[DataFrame] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorExpressions.pqDecode
    val enc = codes.getOrElse(pqEncode(corpus, banks, idCol, vecCol))
      .withColumn("rv", pqDecode(col("codes"), banks))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("asim").desc, col("neighbor_id").asc)
    val survivors = enc.crossJoin(q)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("asim", cosine(col("qv"), col("rv")))
      .withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= k * refine)
      .select(col("query_id"), col("neighbor_id"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    survivors.join(q, "query_id").join(cv, "neighbor_id")
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** The IVF-PQ index relation in one corpus scan: (neighbor_id, cell,
    * codes). Persist with `.write.bucketBy(n, "cell")` for probe reuse. */
  def ivfPqIndex(corpus: DataFrame, centroids: Array[Array[Double]],
      banks: Array[Array[Array[Double]]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorExpressions.{nearestCentroids, pqCodes}
    corpus.select(col(idCol).as("neighbor_id"),
      element_at(nearestCentroids(col(vecCol), centroids, 1), 1).as("cell"),
      pqCodes(col(vecCol), banks).as("codes"))
  }

  /** IVF-PQ approximate top-k — the two scale levers composed, as in the
    * standard billion-scale ANN layout: coarse-cell routing means only the
    * `nProbe`-of-`nCells` probed cells' rows are scored at all, and PQ
    * compression means scoring reads m small codes instead of the vector
    * column. True vectors are fetched only for the k·refine survivors.
    * Both model artifacts (centroid bank + codebooks) are driver-side
    * model-size; pass `index` (a persisted [[ivfPqIndex]]) to skip
    * assignment/encode entirely. */
  def ivfPqTopK(
      queries: DataFrame, corpus: DataFrame, k: Int,
      centroids: Array[Array[Double]], banks: Array[Array[Array[Double]]],
      nProbe: Int = 8, refine: Int = 24,
      index: Option[DataFrame] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorExpressions.{nearestCentroids, pqDecode}
    val idx = index.getOrElse(ivfPqIndex(corpus, centroids, banks, idCol, vecCol))
    val probes = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"),
      explode(nearestCentroids(col(vecCol), centroids, nProbe)).as("cell")))
    val wApprox = Window.partitionBy(col("query_id"))
      .orderBy(col("asim").desc, col("neighbor_id").asc)
    val survivors = idx
      .join(probes, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("asim", cosine(col("qv"), pqDecode(col("codes"), banks)))
      .withColumn("arank", row_number().over(wApprox))
      .filter(col("arank") <= k * refine)
      .select(col("query_id"), col("neighbor_id"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    survivors.join(q, "query_id").join(cv, "neighbor_id")
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Persist the LSH bucket index as a Spark bucketed + sorted table.
    * Probes then read (id, table, bucket) without recomputing signatures or
    * scanning the vector column, and any (table, bucket)-keyed aggregation
    * or window — [[Dedup.bucketPairs]]'s whole pipeline — runs
    * EXCHANGE-FREE, because the file bucketing already clusters those keys.
    * This is the "at scale you'd persist the buckets" note made real: build
    * the index once per corpus snapshot, amortize it over every probe. */
  def writeLshIndex(
      corpus: DataFrame, tableName: String, tables: Int, bits: Int, dim: Int,
      seed: Long = 42L, numBuckets: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    lshBuckets(corpus, tables, bits, dim, seed, idCol, vecCol)
      .write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, "table", "bucket").sortBy("table", "bucket")
      .saveAsTable(tableName)

  /** Persist the IVF cell assignment as a bucketed table keyed on `cell`;
    * pair with the [[ivfCentroids]] bank that produced it. Probing a
    * persisted index is a cell-clustered scan — no assignment recompute. */
  def writeIvfIndex(
      corpus: DataFrame, tableName: String, centroids: Array[Array[Double]],
      numBuckets: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    ivfAssign(corpus, centroids, idCol, vecCol)
      .write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, "cell").sortBy("cell")
      .saveAsTable(tableName)

  /** Append a new vector batch to a persisted IVF index — the daily
    * increment of the index lifecycle (the ANN analogue of
    * `Dedup.exactKeptIncremental`). Only the new batch is assigned and
    * written; the existing index never rewrites, re-assigns, or shuffles —
    * at 100 TB the increment's cost is proportional to the increment.
    * Appended files land in the same bucket layout, so cell-clustered
    * probes and exchange-free bucket-keyed aggregation keep working.
    *
    * MUST be called with the same centroid bank the index was built with
    * (same contract as [[ivfTopK]]'s `corpusIndex` — a different bank
    * would put new vectors in cells probes won't search). Centroids drift
    * as the corpus grows; re-train and rebuild when probe recall decays,
    * not per batch. */
  def appendIvfIndex(
      batch: DataFrame, tableName: String, centroids: Array[Array[Double]],
      numBuckets: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): Unit =
    ivfAssign(batch, centroids, idCol, vecCol)
      .write.mode("append").format("parquet")
      .bucketBy(numBuckets, "cell").sortBy("cell")
      .saveAsTable(tableName)

  /** Embedding-level near-duplicate pairs: corpus×corpus restricted to
    * shared LSH buckets, kept when cosine ≥ `threshold`.
    * Returns (id_a, id_b, sim), id_a < id_b.
    *
    * `probeRadius ≥ 1` additionally pairs rows whose per-table buckets
    * differ in ≤ `probeRadius` sign bits — the pair-generation analogue of
    * [[lshTopK]]'s multi-probe. Near-threshold pairs straddle hyperplanes
    * by definition (a cosine barely over `threshold` disagrees on ~⅓ of
    * sign bits), so exact-bucket collision probability per table is
    * p^bits with p well below 1: probing recovers recall without
    * coarsening `bits`, which must keep growing with corpus size at
    * 100 TB. Only the ids-only probe rows multiply (×(1+bits+C(bits,2))
    * at radius 2); vectors are re-attached per surviving candidate, and
    * degenerate buckets stay capped on the index side BEFORE the join
    * (same guard as [[graft.operators.Dedup.bucketPairs]]). */
  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    * clustering embeddings and dropping near-duplicates WITHIN each
    * cluster — the k-means cells bound the pairwise comparison exactly
    * like LSH buckets bound near-dup candidates, so the corpus never
    * pairs globally. This greedy variant drops a vector iff a smaller-id
    * vector in its cell is cosine-≥-`threshold` similar (deterministic,
    * locally decidable — no transitive clustering pass).
    *
    * Scale: `nCells` grows with the corpus so the expected cell stays
    * bounded; within-cell pairing shuffles once on `cell`, and the
    * centroid bank is driver-side model-size like every IVF artifact.
    *
    * Returns one row per vector: (idCol, cell, kept, dup_of, sim) — for
    * dropped rows, `dup_of` is the SMALLEST qualifying smaller id and
    * `sim` its cosine; kept rows carry NULLs. */
  def semDedup(corpus: DataFrame, threshold: Double,
      centroids: Array[Array[Double]],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // materialize the assignment once — it feeds both sides of the cell
    // self-join plus the final labeling, and Catalyst does not share a
    // subplan across self-join branches, so an unmaterialized plan would
    // run the O(rows·nCells·dim) centroid pass twice
    val a = ivfAssign(corpus, centroids, idCol, vecCol)
      .select(col("cell"), col("neighbor_id").as("id"), col("cv").as("v"))
      .localCheckpoint(true)
    val b = a.select(col("cell"), col("id").as("id2"), col("v").as("v2"))
    val dups = a.join(b, "cell").filter(col("id2") < col("id"))
      .withColumn("sim", cosine(col("v"), col("v2")))
      .filter(col("sim") >= threshold)
      .groupBy(col("cell"), col("id"))
      .agg(min(struct(col("id2"), col("sim"))).as("m"))
    a.join(dups, Seq("cell", "id"), "left")
      .select(col("id").as(idCol), col("cell"),
        col("m").isNull.as("kept"),
        col("m.id2").as("dup_of"), col("m.sim").as("sim"))
  }

  /** Per-dimension z-score standardization of an embedding column — the
    * feature-scaling pass an ML pipeline runs before distance-based ops
    * (k-means, cosine ANN) so no dimension dominates the metric.
    *
    * Determinism at scale: per-dimension sums are staged through
    * DECIMAL(38,18) (Spark's double→decimal cast goes through
    * `Double.toString`, exact to the shortest digits), so the sum is
    * EXACT and order-free — the result is bit-identical under any
    * partitioning, and a DuckDB oracle replays it via the VARCHAR
    * bridge (the p82 query does). The final mean/std/z arithmetic is
    * plain IEEE doubles with a fixed expression tree.
    *
    * Plan shape: one exploded scan (partial aggregation — at most `dim`
    * rows per partition cross the exchange), the model-sized stats fold
    * into ONE broadcast array row, and a second scan rewrites each
    * vector in place via `transform` — no per-row join on the skewed
    * `pos` key (only `dim` distinct values) ever happens.
    *
    * Returns (idCol, z ARRAY<DOUBLE>). Constant dimensions (std = 0)
    * map to z = 0. */
  def standardize(corpus: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 18)
    val stats = corpus
      .filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol).cast("array<double>")))
      .groupBy(col("pos"))
      .agg(sum(col("col").cast(dec)).as("__sd"),
        sum((col("col") * col("col")).cast(dec)).as("__s2d"),
        count(lit(1)).as("__n"))
      .select(col("pos"),
        (col("__sd").cast("double") / col("__n").cast("double")).as("mean"),
        sqrt(greatest(
          (col("__s2d").cast("double") / col("__n").cast("double")) -
            ((col("__sd").cast("double") / col("__n").cast("double")) *
              (col("__sd").cast("double") / col("__n").cast("double"))),
          lit(0.0))).as("std"))
    val statsArr = stats
      .agg(array_sort(collect_list(struct(col("pos"), col("mean"),
        col("std")))).as("__st"))
    // ragged input must fail loud: a vector longer than the stats array
    // would otherwise index past __st and silently emit null z entries
    corpus.filter(col(vecCol).isNotNull)
      .crossJoin(broadcast(statsArr))
      .select(col(idCol),
        expr(s"""CASE WHEN assert_true(
                   size(CAST($vecCol AS ARRAY<DOUBLE>)) = size(__st),
                   concat('standardize: vector of length ',
                     size(CAST($vecCol AS ARRAY<DOUBLE>)),
                     ' does not match stats dimension ', size(__st))) IS NULL
                 THEN transform(CAST($vecCol AS ARRAY<DOUBLE>),
                 (x, i) -> CASE WHEN __st[i].std = CAST(0.0 AS DOUBLE)
                                THEN CAST(0.0 AS DOUBLE)
                                ELSE (x - __st[i].mean) / __st[i].std END)
                 END""")
          .as("z"))
  }

  def embeddingNearDupPairs(
      corpus: DataFrame, threshold: Double, dim: Int,
      tables: Int = 8, bits: Int = 12, seed: Long = 42L,
      maxBucketSize: Int = 1000,
      corpusIndex: Option[DataFrame] = None,
      probeRadius: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= 2, "probeRadius must be 0..2")
    val cb = corpusIndex.getOrElse(
      lshBuckets(corpus, tables, bits, dim, seed, idCol, vecCol))
    val candidates =
      if (probeRadius == 0) Dedup.bucketPairs(cb, Seq("table", "bucket"), maxBucketSize)
      else {
        val flips1 = (0 until bits).map(i => 1L << i)
        val flips2 = if (probeRadius < 2) Seq.empty[Long]
          else for { i <- 0 until bits; j <- (i + 1) until bits }
            yield (1L << i) | (1L << j)
        val probes = cb.withColumn("bucket", explode(array(
          col("bucket") +: (flips1 ++ flips2).map(m =>
            col("bucket").bitwiseXOR(lit(m))): _*)))
        val perBucket = Window.partitionBy(col("table"), col("bucket"))
        val idx = cb
          .withColumn("__n", count(lit(1)).over(perBucket))
          .filter(col("__n") <= maxBucketSize)
          .select(col("id").as("id_x"), col("table"), col("bucket"))
        probes.join(idx, Seq("table", "bucket"))
          .filter(col("id") < col("id_x"))
          .select(col("id").as("id_a"), col("id_x").as("id_b"))
          .dropDuplicates("id_a", "id_b")
      }
    candidates
      .join(corpus.select(col(idCol).as("id_a"), col(vecCol).as("v_a")), "id_a")
      .join(corpus.select(col(idCol).as("id_b"), col(vecCol).as("v_b")), "id_b")
      .withColumn("sim", cosine(col("v_a"), col("v_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
