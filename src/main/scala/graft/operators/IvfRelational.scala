package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** IVF with the centroid bank as a RELATION — the unbounded-cell-count
  * scale path that [[Similarity.ivfCentroidsTrained]]'s driver-held bank
  * cannot reach.
  *
  * The driver-bank form is fastest per row (the bank rides into codegen
  * as one reference object feeding a tight kernel loop — NOT literal
  * code, so there is no generated-code-size ceiling), but it is
  * DRIVER-BOUNDED: every Lloyd round `collect()`s cells×dim aggregate
  * rows to the driver and re-ships the whole bank inside the next
  * round's task closures. Model-sized banks (128×64) don't notice; the
  * scale-correct policy does. The r8 sf1 probe measured why cells must
  * grow: pinned at 128 while the corpus grows 10× means 10× occupancy,
  * and the pinned nProbe=48's recall rots 0.98 → 0.84 (`tools/IvfSweep`:
  * 96 probes restore 1.00). Cells ∝ corpus keeps occupancy constant —
  * but at 100 TB that is 10⁵–10⁶ cells, where per-round driver pulls and
  * per-task closure shipping of a multi-GB bank are the bottleneck, so
  * the bank must be data end to end, not a driver array.
  *
  * Everything here is plain DataFrame algebra: assignment is a broadcast
  * cross join with the bank plus a map-side `min(struct(dist, cell))`
  * partial aggregation (only one row per vector crosses the exchange —
  * the n·cells distance rows collapse before the wire), and training is
  * the same decimal-staged Lloyd update as the literal path, so banks are
  * bit-identical across partitionings and the existing `ivfBankCtes`
  * DuckDB replay verifies this engine unchanged. The distance is the
  * `seqSqDist` fold (0.0-seeded left fold, dims ascending), ties to the
  * lower cell — the `nearestCentroids` kernel's exact contract.
  *
  * The bank never touches the driver: train → probe composes as pure
  * plans (each round's bank is `localCheckpoint`ed — model-sized — to
  * stop lineage stacking across Lloyd rounds).
  */
object IvfRelational {

  /** Squared-L2 as the `seqSqDist` rounding sequence: 0.0-seeded left
    * fold, dimensions ascending, `(a_i - b_i)²` terms. */
  private def sqDist(a: Column, b: Column): Column =
    aggregate(sequence(lit(1), size(a)), lit(0.0),
      (acc, i) => acc +
        (element_at(a, i) - element_at(b, i)) *
          (element_at(a, i) - element_at(b, i)))

  /** The stride-sample seed bank as a relation: of the first
    * `nCells·stride` corpus rows by id, every `stride`-th vector becomes
    * cell `(rank-1)/stride`. The single-partition window runs on the
    * ALREADY-LIMITED prefix (≤ nCells·stride rows — model-sized), never
    * the corpus. */
  def seedBank(corpus: DataFrame, nCells: Int, stride: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus.orderBy(col(idCol)).limit(nCells * stride)
      .select(col(idCol).as("__id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("__rn", row_number().over(Window.orderBy(col("__id"))))
      .filter((col("__rn") - 1) % stride === 0 &&
        (col("__rn") - 1) / stride < nCells)
      .select((((col("__rn") - 1) / stride)).cast("int").as("cell"), col("cv"))

  /** Nearest-cell assignment under a bank RELATION `bank(cell, cv)`:
    * broadcast cross join + argmin of the seqSqDist fold, ties to the
    * lower cell. Partial aggregation collapses the n·cells distance rows
    * map-side; the exchange carries one row per vector. Returns
    * (id, v, cell). */
  def assign(corpus: DataFrame, bank: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .crossJoin(broadcast(bank))
      .withColumn("__d", sqDist(col("v"), col("cv")))
      .groupBy(col("id"))
      // v is constant per id; max is a deterministic carrier for it
      .agg(min(struct(col("__d"), col("cell"))).as("__m"), max(col("v")).as("v"))
      .select(col("id"), col("v"), col("__m.cell").as("cell"))

  /** `iters` decimal-staged Lloyd rounds from the stride seed, entirely
    * as DataFrames — the bank is data end to end. Each round: one
    * broadcast-assign scan + one (cell, pos)-keyed exact-DECIMAL partial
    * aggregation (≤ cells·dim rows cross the exchange); an emptied cell
    * keeps its previous centroid. Returns the bank relation (cell, cv),
    * bit-identical to [[Similarity.ivfCentroidsTrained]] under the same
    * (nCells, iters, stride). */
  def trainBank(corpus: DataFrame, nCells: Int, iters: Int = 3,
      stride: Int = 50, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    var bank = seedBank(corpus, nCells, stride, idCol, vecCol)
      .localCheckpoint(true)
    var it = 0
    while (it < iters) {
      val means = assign(corpus, bank, idCol, vecCol)
        .select(col("cell"), posexplode(col("v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("col").cast(DecimalType(38, 18))).as("__s"),
          count(lit(1)).as("__n"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"),
          (col("__s").cast("double") / col("__n")).as("m")))).as("__pm"))
        .select(col("cell"),
          transform(col("__pm"), e => e.getField("m")).as("__nc"))
      bank = bank.join(means, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("__nc"), col("cv")).as("cv"))
        .localCheckpoint(true)
      it += 1
    }
    bank
  }

  /** IVF top-k with the relation-form bank: each query probes its
    * `nProbe` nearest cells (same (dist, cell) order), candidates are the
    * probed cells' members, exact cosine rerank keeps k. Queries+probes
    * broadcast; the corpus is scanned once for assignment and never
    * shuffled on anything but its cell. Returns
    * (query_id, rank, neighbor_id, sim). */
  def topK(queries: DataFrame, corpus: DataFrame, bank: DataFrame,
      k: Int, nProbe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    import graft.functions.VectorExpressions.cosine
    val probes = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .crossJoin(broadcast(bank))
      .withColumn("__d", sqDist(col("qv"), col("cv")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__d").asc, col("cell").asc)))
      .filter(col("__rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    val assigned = assign(corpus, bank, idCol, vecCol)
      .select(col("id").as("neighbor_id"), col("v").as("nv"), col("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    assigned.join(broadcast(probes), "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine(col("qv"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }
}
