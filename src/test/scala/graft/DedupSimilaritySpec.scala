package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Semantics of the non-oracle (custom-hash) operators, on planted data:
  * near-duplicates the operator must find, unrelated docs it must not pair. */
class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
    "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")

  /** doc text of `n` pseudo-random vocab words, deterministic in `seed`. */
  private def doc(seed: Long, n: Int): String =
    (0 until n).map(i =>
      vocab((graft.functions.Hash64.mix(seed * 1000 + i) % vocab.size).toInt.abs))
      .mkString(" ")

  test("exact dedup keeps min id per duplicate group") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("doc_id", "text")
    val got = Dedup.exact(df, "doc_id", Seq("text"))
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (3L, 1L)))
    val kept = Dedup.exactKept(df, "doc_id", Seq("text"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L))
  }

  test("minhash LSH finds a planted near-duplicate, not unrelated docs") {
    val base = doc(7, 120)
    val nearDup = base.split(" ").updated(3, "changedword").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, nearDup),
      (3L, doc(100, 120)), (4L, doc(200, 120))).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "planted near-dup not found")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._2 == 4L),
      s"unrelated docs paired: $pairs")
  }

  test("char-shingle minhash finds near-dups in unsegmented text") {
    val base = doc(7, 120).replace(" ", "")       // no token boundaries
    val nearDup = base.substring(0, 200) + "XYZZY" + base.substring(205)
    val docs = Seq(
      (1L, base), (2L, nearDup),
      (3L, doc(100, 120).replace(" ", ""))).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
        numHashes = 64, bands = 16, shingleSize = 3, threshold = 0.5,
        charShingles = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"planted char-level near-dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash finds the planted near-duplicate pair") {
    val base = doc(7, 120)
    val nearDup = base.split(" ").updated(3, "changedword").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, nearDup), (3L, doc(100, 120))).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  /** deterministic pseudo-random unit-ish vector */
  private def vec(seed: Long, dim: Int): Seq[Float] =
    (0 until dim).map { i =>
      val u = graft.functions.Hash64.mix(seed * 7919 + i)
      ((u >>> 11).toDouble / (1L << 52).toDouble - 1.0).toFloat
    }

  test("brute-force top-k: planted near-identical vector ranks first") {
    val dim = 16
    val v0 = vec(1, dim)
    val near = v0.updated(0, v0.head + 0.01f)
    val corpus = (Seq((0L, v0), (99L, near)) ++
      (1L to 20L).map(i => (i, vec(i + 100, dim)))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(
        corpus.filter(col("vec_id") === 0), corpus, k = 3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toMap
    assert(top(1) === 99L, s"nearest should be the planted twin, got $top")
  }

  test("LSH top-k finds the planted twin and agrees with brute force on it") {
    val dim = 16
    val v0 = vec(1, dim)
    val near = v0.updated(0, v0.head + 0.01f)
    val corpus = (Seq((0L, v0), (99L, near)) ++
      (1L to 50L).map(i => (i, vec(i + 100, dim)))).toDF("vec_id", "embedding")
    val ann = Similarity.lshTopK(
        corpus.filter(col("vec_id") === 0), corpus, k = 3, dim = dim,
        tables = 8, bits = 4)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toMap
    assert(ann.get(1) === Some(99L),
      s"LSH should retrieve the near-identical twin first, got $ann")
  }

  test("embedding near-dup pairs: planted pair found above threshold") {
    val dim = 16
    val v0 = vec(1, dim)
    val near = v0.updated(0, v0.head + 0.01f)
    val corpus = (Seq((0L, v0), (99L, near)) ++
      (1L to 50L).map(i => (i, vec(i + 100, dim)))).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupPairs(corpus, threshold = 0.99,
        dim = dim, tables = 8, bits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 99L)))
  }

  test("two-phase top-k agrees exactly with the window top-k") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
    val window = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "rank", "neighbor_id", "sim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val twoPhase = Similarity.bruteForceTopKTwoPhase(queries, emb, k = 5)
      .select("query_id", "rank", "neighbor_id", "sim")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(twoPhase === window)
  }

  test("IVF top-k finds the planted twin; recall vs brute is usable") {
    val dim = 16
    val v0 = vec(1, dim)
    val near = v0.updated(0, v0.head + 0.01f)
    val corpus = (Seq((0L, v0), (99L, near)) ++
      (1L to 50L).map(i => (i, vec(i + 100, dim)))).toDF("vec_id", "embedding")
    val ann = Similarity.ivfTopK(
        corpus.filter(col("vec_id") === 0), corpus, k = 3,
        nCells = 4, nProbe = 2)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toMap
    assert(ann.get(1) === Some(99L), s"IVF should find the twin, got $ann")

    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(queries, emb, k = 5, nCells = 16, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall > 0.5, s"IVF recall $recall too low")
  }

  test("LSH recall vs brute force on real embeddings is usable (>0.5)") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(queries, emb, k = 5, dim = 64,
        tables = 8, bits = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (brute & ann).size.toDouble / brute.size
    assert(recall > 0.5, s"recall $recall too low")
  }
}
