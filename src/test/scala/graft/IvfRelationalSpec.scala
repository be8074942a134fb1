package graft

import graft.operators.{IvfRelational, Similarity}
import graft.sources.Tables

/** The relation-bank IVF's contract is EQUIVALENCE: same seed, same Lloyd
  * rounds, same assignment argmin as the driver-bank path — just expressed
  * as DataFrame algebra so the cell count is unbounded (no per-Lloyd-round
  * driver pull). These tests pin the scaladoc claims in `IvfRelational.scala`
  * (bank bit-identity with `ivfCentroidsTrained`; top-k row-identity with
  * `ivfTopK` under the same bank) — the claims the r8 verdict flagged as
  * asserted-but-unverified. */
class IvfRelationalSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("trainBank is bit-identical to the literal-path ivfCentroidsTrained") {
    val lit = Similarity.ivfCentroidsTrained(emb, nCells = 8, iters = 2,
      stride = 5)
    val rel = IvfRelational.trainBank(emb, nCells = 8, iters = 2, stride = 5)
      .collect().sortBy(_.getInt(0))
    assert(rel.length == lit.length,
      s"cell count ${rel.length} vs ${lit.length}")
    rel.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i, s"missing cell $i")
      val cv = r.getSeq[Double](1)
      // exact == on doubles: bit-identity, not tolerance
      assert(cv == lit(i).toSeq, s"cell $i centroid differs:\n$cv\nvs\n${lit(i).toSeq}")
    }
  }

  test("seedBank matches the stride-sample driver pull exactly") {
    val lit = Similarity.ivfCentroids(emb, nCells = 8, stride = 5)
    val rel = IvfRelational.seedBank(emb, nCells = 8, stride = 5)
      .collect().sortBy(_.getInt(0))
    assert(rel.length == lit.length)
    rel.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[Double](1) == lit(i).toSeq, s"seed cell $i differs")
    }
  }

  test("topK through the relation bank row-matches ivfTopK under the same bank") {
    val lit = Similarity.ivfCentroidsTrained(emb, nCells = 8, iters = 2,
      stride = 5)
    val relBank = IvfRelational.trainBank(emb, nCells = 8, iters = 2,
      stride = 5)
    val qs = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val want = Similarity.ivfTopK(qs, emb, k = 5, nProbe = 4,
        centroids = Some(lit))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2))
    val got = IvfRelational.topK(qs, emb, relBank, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2))
    assert(got.length == want.length,
      s"row count ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"top-k row differs: $g vs $w")  // sim compared bit-exact
    }
  }

  test("topKIndexed over a pre-assigned index row-matches topK (the " +
      "probe-session form never re-assigns)") {
    import org.apache.spark.sql.functions.col
    val relBank = IvfRelational.trainBank(emb, nCells = 8, iters = 2,
      stride = 5)
    val qs = emb.filter(col("vec_id") < 10)
    val want = IvfRelational.topK(qs, emb, relBank, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2))
    // the IvfStream.readIndex shape: (neighbor_id, cell, v) assigned once
    val index = IvfRelational.assign(emb, relBank, "vec_id", "embedding")
      .select(col("id").as("neighbor_id"), col("cell"), col("v"))
    val got = IvfRelational.topKIndexed(qs, index, relBank, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2))
    assert(got.length == want.length,
      s"row count ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"indexed top-k row differs: $g vs $w")
    }
  }

  test("topKPq through the relation coarse bank row-matches ivfPqTopK " +
      "under the same bank and codebooks") {
    val lit = Similarity.ivfCentroidsTrained(emb, nCells = 8, iters = 2,
      stride = 5)
    val relBank = IvfRelational.trainBank(emb, nCells = 8, iters = 2,
      stride = 5)
    val banks = Similarity.pqTrain(emb, m = 8, nCodes = 16, iters = 2)
    val qs = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val want = Similarity.ivfPqTopK(qs, emb, k = 5, centroids = lit,
        banks = banks, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2))
    val got = IvfRelational.topKPq(qs, emb, relBank, banks, k = 5, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).sortBy(t => (t._1, t._2))
    assert(got.length == want.length,
      s"row count ${got.length} vs ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g == w, s"ivf-pq top-k row differs: $g vs $w")
    }
  }

  test("assign ties go to the lower cell (nearestCentroids contract)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two identical centroids: every vector is equidistant; cell 0 must win
    val corpus = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(-3.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val bank = Seq((1, Seq(0.0, 0.0)), (0, Seq(0.0, 0.0)))
      .toDF("cell", "cv")
    val cells = IvfRelational.assign(corpus, bank)
      .select(col("cell")).collect().map(_.getInt(0)).toSeq
    assert(cells == Seq(0, 0), s"ties must resolve to the lower cell: $cells")
  }
}
