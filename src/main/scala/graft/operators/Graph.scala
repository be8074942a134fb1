package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Graph statistics over a pair relation (undirected edges), composed from
  * joins and aggregations — no graph library, no driver-side adjacency.
  * Complements [[Dedup.connectedComponentsStar]]: components tell you how
  * many duplicate families exist; triangles/clustering tell you how clique-
  * like each family is (boilerplate clusters are dense; drifting chains are
  * not).
  */
object Graph {

  /** One-row graph summary of `pairs` (columns `id_a`, `id_b`; treated as
    * undirected, self-loops and duplicate pairs ignored): node count, edge
    * count, wedge count (paths of length 2), triangle count, and the global
    * clustering coefficient `3·triangles / wedges`.
    *
    * Triangles use the degree-ordered orientation: each edge points from
    * its (degree, id)-smaller endpoint, so every wedge fans out from the
    * lowest-degree corner of its triangle — max out-degree is O(√m) and
    * the wedge join cannot explode on a hub node (the standard distributed
    * triangle-counting trick; a hub of degree d would otherwise emit
    * C(d, 2) wedges). The orientation is a strict total order, so each
    * triangle is counted exactly once; the count is orientation-invariant,
    * which lets an oracle verify with the naive id-ordered formulation. */
  def stats(pairs: DataFrame): DataFrame = {
    // canonical u < v edge set; feeds degrees, the wedge join, and the
    // closing semi-join — materialize once
    val edges = pairs
      .select(least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    val deg = edges.select(col("u").as("node"))
      .unionAll(edges.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val out = withDeg.select(
      when(col("du") < col("dv") ||
           (col("du") === col("dv") && col("u") < col("v")),
        struct(col("u").as("src"), col("v").as("dst")))
        .otherwise(struct(col("v").as("src"), col("u").as("dst"))).as("e"))
      .select(col("e.src").as("s"), col("e.dst").as("d"))
    val o1 = out.select(col("s"), col("d").as("a"))
    val o2 = out.select(col("s"), col("d").as("b"))
    val tri = o1.join(o2, "s").filter(col("a") < col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .join(edges, Seq("u", "v"), "left_semi")
    edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes"),
        floor(sum(col("deg") * (col("deg") - lit(1))) / lit(2.0))
          .cast("bigint").as("n_wedges")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          (col("n_triangles") * 3).cast(DoubleType) /
            col("n_wedges").cast(DoubleType))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** Integer-scaled PageRank over an undirected pair relation: ranks carry
    * as `pr = rank × scale` BIGINTs and every step is integer arithmetic
    * (`div`), so the result is bit-deterministic under any partitioning —
    * no float fold-order concerns — and an oracle can replay the exact
    * iterations in SQL. Damping 0.85 as the exact rational 85/100.
    *
    * Scale: per-iteration cost is one join of the edge list with the
    * current ranks plus a partial+final sum by destination; edge list and
    * degrees are materialized once (`localCheckpoint`), loop state is
    * checkpointed per round (unmaterialized iterative plans re-derive
    * their upstream per round). Rank mass per node is bounded by `scale`,
    * so 85·sum stays far inside 64 bits.
    *
    * Undirected expansion means every node has in-edges (no dangling-mass
    * term). Returns (id, pr). */
  def pageRankScaled(edges: DataFrame, iters: Int = 3,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val dir = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    val deg = dir.groupBy(col("src"))
      .agg(count(lit(1)).as("deg")).localCheckpoint(true)
    val nn = deg.agg(count(lit(1)).as("n"))
    var pr = deg.crossJoin(broadcast(nn))
      .selectExpr("src AS id", s"$scale div n AS pr")
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = dir.join(deg, "src")
        .join(pr.withColumnRenamed("id", "src"), "src")
        .selectExpr("dst", "pr div deg AS c")
      pr = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
        .crossJoin(broadcast(nn))
        .selectExpr("dst AS id",
          s"((15 * $scale) div (100 * n)) + ((85 * s) div 100) AS pr")
        .localCheckpoint(true)
    }
    pr
  }

  /** k-core: the maximal subgraph in which every node has degree ≥ `k`,
    * by iterative peeling — drop all nodes of degree < k, restrict the
    * edge set, repeat to fixpoint. The k-core is UNIQUE (independent of
    * peel order), so any correct implementation agrees on it — which
    * lets an oracle verify with a completely different peel schedule.
    * Curation use: near-dup/spam families that are chains or stars
    * dissolve under k ≥ 2 peeling, while genuinely dense boilerplate
    * cliques survive — a structural filter no per-pair threshold gives.
    *
    * Each round is one degree aggregation + two semi-joins, all keyed by
    * node — O(rounds) exchanges, rounds bounded by the graph's
    * degeneracy ordering depth (tiny in practice; throws on `maxRounds`
    * exhaustion like the CC loops rather than returning a partial core).
    *
    * Returns the core's nodes with their in-core degrees:
    * (id, core_deg). */
  /** Canonical undirected edge set of a pair relation: u < v, self-loops
    * and duplicate pairs dropped, materialized once. */
  private def canonicalEdges(pairs: DataFrame): DataFrame = pairs
    .select(least(col("id_a"), col("id_b")).as("u"),
      greatest(col("id_a"), col("id_b")).as("v"))
    .filter(col("u") =!= col("v"))
    .distinct()
    .localCheckpoint(true)

  /** Peel `edges0` (canonical, materialized, `count0` rows) to its k-core
    * fixpoint. Each round is one degree aggregation + two semi-joins; the
    * edge count carries across rounds (this round's count IS last round's
    * `next.count()`). Returns the fixpoint edge set and its count. */
  private def peelToCore(edges0: DataFrame, count0: Long, k: Int,
      maxRounds: Int): (DataFrame, Long) = {
    var edges = edges0
    var edgeCount = count0
    var rounds = 0
    var stable = edgeCount == 0
    while (!stable && rounds < maxRounds) {
      val deg = edges.select(col("u").as("node"))
        .unionAll(edges.select(col("v").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      // keep stays eagerly checkpointed: r18 measured the lazy form
      // (betting on ReuseExchange across the two semi-joins) 0.6 s SLOWER
      // on p71 — the duplicated degree aggregation inside the
      // single-partition round costs more than the action it saves
      val keep = deg.filter(col("deg") >= k).select(col("node"))
        .localCheckpoint(true)
      val next = edges
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      val nextCount = next.count()
      stable = nextCount == edgeCount
      edges = next
      edgeCount = nextCount
      rounds += 1
    }
    if (!stable) throw new IllegalStateException(
      s"k-core peel (k=$k) did not reach its fixpoint in $maxRounds rounds; raise maxRounds")
    (edges, edgeCount)
  }

  def kCore(pairs: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    require(k >= 1)
    val edges = canonicalEdges(pairs)
    // peel rounds shuffle a shrinking, usually tiny edge set — scale the
    // loop's shuffle width to it (same discipline as the CC loops)
    val edgeCount = edges.count()
    Dedup.withLoopParallelism(edges, edgeCount) {
      val (core, _) = peelToCore(edges, edgeCount, k, maxRounds)
      core.select(col("u").as("id"))
        .unionAll(core.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("core_deg"))
    }
  }

  /** Full coreness decomposition: for every node with degree ≥ 1, the
    * largest k such that the node belongs to the k-core. THE standard
    * graph-curation signal ([[kCore]] gives one layer; this gives them
    * all): coreness 1 = chain/star periphery, high coreness = densely
    * boilerplate-like families.
    *
    * Layered peel exploiting core nesting (k-core ⊇ (k+1)-core): peel the
    * 2-core from the full edge set, the 3-core FROM THE 2-CORE's edges,
    * and so on until the core empties — each layer continues from the
    * previous one rather than restarting from the full graph, so total
    * work is O(degeneracy) fixpoint peels over strictly shrinking edge
    * sets. `coreness(v) = max k over the cores containing v`, computed as
    * one union + max aggregation over the recorded layer node sets.
    *
    * Scale: the loop never touches the original relation after the first
    * canonical edge materialization; every round's shuffle width scales
    * to the current edge count ([[Dedup.withLoopParallelism]]), and the
    * per-layer node sets that accumulate are ids only. Rounds are bounded
    * by degeneracy × `maxRounds` (throws rather than returning a partial
    * decomposition, like the CC loops). `maxK` caps runaway layering on
    * pathological graphs (throws if the core is still non-empty there —
    * a dense clique of that depth is almost certainly an upstream bug).
    *
    * Returns (id, coreness). */
  def coreness(pairs: DataFrame, maxK: Int = 64, maxRounds: Int = 30): DataFrame = {
    val base = canonicalEdges(pairs)
    val baseCount = base.count()
    Dedup.withLoopParallelism(base, baseCount) {
      def nodesOf(e: DataFrame): DataFrame =
        e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
          .distinct()
      var layers = nodesOf(base).withColumn("k", lit(1))
      var edges = base
      var edgeCount = baseCount
      var k = 2
      while (edgeCount > 0 && k <= maxK) {
        val (core, coreCount) = peelToCore(edges, edgeCount, k, maxRounds)
        if (coreCount > 0)
          layers = layers.unionAll(nodesOf(core).withColumn("k", lit(k)))
        edges = core
        edgeCount = coreCount
        k += 1
      }
      if (edgeCount > 0) throw new IllegalStateException(
        s"coreness: ${k - 1}-core still non-empty at maxK=$maxK; raise maxK")
      layers.groupBy(col("id")).agg(max(col("k")).as("coreness"))
    }
  }
}
