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
}
