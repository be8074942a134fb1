package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Decomp, Dedup, Quality}

/** Specs for the round-8 operators: Gopher-family repetition stats,
  * edit-distance near-dup join, and distributed PCA. */
class QualityDecompSpec extends SparkSpec {
  import spark.implicits._

  // ---- Quality.repetitionStats -------------------------------------------

  private def statsOf(texts: (Long, String)*) =
    Quality.repetitionStats(
        texts.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()

  test("repetitionStats: crafted docs hit every branch") {
    val rows = statsOf(
      0L -> "alpha beta gamma delta echo",  // all-distinct
      1L -> "x x x x",                      // one token, one run
      2L -> "",                             // empty
      3L -> "solo",                         // single token
      4L -> "a b a b a b")                  // repeated bigram cycle
    val r0 = rows(0)
    assert(r0.getAs[Int]("n_toks") == 5)
    assert(r0.getAs[Double]("distinct_ratio") == 1.0)
    assert(r0.getAs[Double]("top_bigram_frac") == 0.25) // 1 of 4, all unique
    assert(r0.getAs[Double]("dup_bigram_frac") == 0.0)
    assert(r0.getAs[Int]("max_run") == 1)

    val r1 = rows(1)
    assert(r1.getAs[Double]("distinct_ratio") == 0.25)
    assert(r1.getAs[Double]("top_bigram_frac") == 1.0) // "x x" ×3
    assert(r1.getAs[Double]("dup_bigram_frac") == 1.0)
    assert(r1.getAs[Int]("max_run") == 4)
    assert(!r1.getAs[Boolean]("keep"))

    val r2 = rows(2)
    assert(r2.getAs[Int]("n_toks") == 0)
    assert(r2.getAs[Double]("distinct_ratio") == 0.0)
    assert(r2.getAs[Double]("top_bigram_frac") == 1.0)
    assert(r2.getAs[Int]("max_run") == 0)

    val r3 = rows(3)
    assert(r3.getAs[Int]("n_toks") == 1)
    assert(r3.getAs[Int]("max_run") == 1)

    val r4 = rows(4)
    // bigrams: "a b","b a","a b","b a","a b" → top = 3/5
    assert(r4.getAs[Double]("top_bigram_frac") == 0.6)
    assert(r4.getAs[Double]("dup_bigram_frac") == 1.0)
    assert(r4.getAs[Int]("max_run") == 1)
  }

  test("repetitionStats: matches an independent in-memory reference") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docs = (0L until 60L).map { i =>
      val n = rnd.nextInt(12)
      (i, Vector.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    def ref(text: String): (Int, Double, Double, Double, Int) = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      val n = toks.length
      val dr = if (n == 0) 0.0 else toks.distinct.length.toDouble / n
      val bg = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toVector
      val top = if (n < 2) 1.0
        else bg.groupBy(identity).values.map(_.size).max.toDouble / bg.size
      val dup = if (n < 2) 0.0
        else (bg.size - bg.groupBy(identity).values.count(_.size == 1)).toDouble / bg.size
      val run = if (n == 0) 0 else {
        var best = 1; var cur = 1
        for (i <- 1 until n) {
          cur = if (toks(i) == toks(i - 1)) cur + 1 else 1
          best = math.max(best, cur)
        }
        best
      }
      (n, dr, top, dup, run)
    }
    val got = statsOf(docs: _*)
    docs.zip(got).foreach { case ((_, text), row) =>
      val (n, dr, top, dup, run) = ref(text)
      assert(row.getAs[Int]("n_toks") == n, s"n_toks for '$text'")
      assert(row.getAs[Double]("distinct_ratio") == dr, s"dr for '$text'")
      assert(row.getAs[Double]("top_bigram_frac") == top, s"top for '$text'")
      assert(row.getAs[Double]("dup_bigram_frac") == dup, s"dup for '$text'")
      assert(row.getAs[Int]("max_run") == run, s"run for '$text'")
    }
  }

  test("repetitionStats: scan-shaped — no exchange in the plan") {
    val df = Quality.repetitionStats(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"repetition stats must not shuffle:\n$plan")
  }

  // ---- Dedup.editDistancePairs -------------------------------------------

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
      if (i == 0) j else if (j == 0) i else 0))
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistancePairs: near-copies verified with exact distances") {
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the sleepy cat watches from the old wooden fence nearby today"
    val mutated = base.replace("lazy", "hazy").replace("wooden", "stone")
    val far = "completely different content about databases and query engines " +
      "with nothing shared at all in any shingle of this entire document text"
    val docs = Seq((1L, base), (2L, mutated), (3L, far), (4L, base))
      .toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text", maxDist = 20)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.contains((1L, 2L, lev(base, mutated))),
      s"mutated pair missing or wrong distance: ${got.toSeq}")
    assert(got.contains((1L, 4L, 0)), "identical pair must verify at dist 0")
    assert(got.contains((2L, 4L, lev(base, mutated))))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L), "far doc must not pair")
    assert(got.forall(p => p._1 < p._2), "pairs must be ordered id_a < id_b")
    assert(got.forall(_._3 <= 20))
  }

  test("editDistancePairs: threshold excludes pairs beyond maxDist") {
    val base = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
    val mutated = base.replace("three", "tree").replace("nine", "wine")
    val d = lev(base, mutated)
    val docs = Seq((1L, base), (2L, mutated)).toDF("doc_id", "text")
    val tight = Dedup.editDistancePairs(docs, "doc_id", "text", maxDist = d - 1)
    assert(tight.count() == 0, s"dist $d must not pass maxDist ${d - 1}")
    val loose = Dedup.editDistancePairs(docs, "doc_id", "text", maxDist = d)
    assert(loose.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSeq == Seq((1L, 2L, d)))
  }

  // ---- Decomp (PCA) -------------------------------------------------------

  /** Deterministic synthetic corpus with a dominant axis: x ≈ t·dir +
    * noise, unit-normalized like the real embeddings table. */
  private def axisCorpus(n: Int, d: Int, seed: Long = 11L) = {
    val rnd = new scala.util.Random(seed)
    val dir = Array.tabulate(d)(i => if (i == 2) 0.9 else if (i == 5) 0.3 else 0.0)
    val rows = (0L until n.toLong).map { id =>
      val t = rnd.nextGaussian() * 2.0
      val v = Array.tabulate(d)(i => (t * dir(i) + rnd.nextGaussian() * 0.05).toFloat)
      (id, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("pcaFit: PC1 aligns with the dominant axis; components orthonormal") {
    val d = 8
    val m = Decomp.pcaFit(axisCorpus(400, d), k = 2, iters = 24)
    val expect = {
      val raw = Array.tabulate(d)(i => if (i == 2) 0.9 else if (i == 5) 0.3 else 0.0)
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / nrm)
    }
    val cos = m.components(0).zip(expect).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.99, s"PC1 misaligned: |cos|=$cos")
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dot(m.components(0), m.components(0)) - 1.0) < 1e-12)
    assert(math.abs(dot(m.components(1), m.components(1)) - 1.0) < 1e-12)
    assert(math.abs(dot(m.components(0), m.components(1))) < 1e-6,
      "components must be (numerically) orthogonal")
    assert(m.eigenvalues(0) > m.eigenvalues(1),
      "eigenvalues must come out in decreasing order")
  }

  test("pca: projection matches a driver-side replay with the same fold order") {
    val corpus = axisCorpus(50, 6, seed = 23L)
    val model = Decomp.pcaFit(corpus, k = 2, iters = 16)
    val got = Decomp.pcaProject(corpus, model).orderBy("vec_id").collect()
    val raw = corpus.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    raw.zip(got).foreach { case ((id, v), row) =>
      assert(row.getLong(0) == id)
      for (c <- 0 until 2) {
        var acc = 0.0
        var i = 0
        while (i < v.length) {
          acc = acc + (v(i) - model.mean(i)) * model.components(c)(i)
          i += 1
        }
        assert(row.getDouble(1 + c) == acc,
          s"pc${c + 1} of vec $id: got ${row.getDouble(1 + c)}, want $acc")
      }
    }
  }

  test("pcaFit: bit-identical across partitionings (decimal staging)") {
    val corpus = axisCorpus(120, 5, seed = 31L)
    val a = Decomp.pcaFit(corpus.repartition(1), k = 2, iters = 16)
    val b = Decomp.pcaFit(corpus.repartition(7), k = 2, iters = 16)
    assert(a.mean.toSeq == b.mean.toSeq)
    assert(a.components.map(_.toSeq).toSeq == b.components.map(_.toSeq).toSeq)
    assert(a.eigenvalues.toSeq == b.eigenvalues.toSeq)
  }

  test("pcaFit: ragged vectors fail loud") {
    val bad = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Decomp.pcaFit(bad, k = 1, iters = 4)
    }
    assert(e.getMessage.contains("ragged"))
  }

  test("pcaFit: a NULL element inside a vector fails loud (r8 advice)") {
    // sum() silently skips NULL terms while a row count would still include
    // them — without the non-null term count this corrupts the covariance
    val bad = Seq(
      (1L, Seq[java.lang.Float](1.0f, 2.0f, 3.0f)),
      (2L, Seq[java.lang.Float](1.0f, null, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Decomp.pcaFit(bad, k = 1, iters = 4)
    }
    assert(e.getMessage.contains("NULL elements"), e.getMessage)
  }

  test("pcaProject: empty and wrong-dimension vectors are excluded, not " +
      "truncated or errored (r8 advice)") {
    val corpus = axisCorpus(30, 4)
    val model = Decomp.pcaFit(corpus, k = 1, iters = 8)
    // an empty vector would descend sequence(0,-1) under ANSI; a short one
    // would silently truncate the dot product — both must just drop
    val mixed = corpus.unionAll(Seq(
      (9001L, Seq.empty[Float]),
      (9002L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding"))
    val ids = Decomp.pcaProject(mixed, model)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(9001L) && !ids.contains(9002L),
      "mis-dimensioned vectors must be excluded from projection")
    assert(ids.size === 30, s"all conforming vectors must project: ${ids.size}")
  }

  test("pcaProject: a wrong-dimension MODEL over a valid corpus fails " +
      "loud instead of returning empty (r9 advice)") {
    val model = Decomp.pcaFit(axisCorpus(30, 4), k = 1, iters = 8)
    val sixDim = axisCorpus(10, 6)
    val e = intercept[IllegalArgumentException] {
      Decomp.pcaProject(sixDim, model)
    }
    assert(e.getMessage.contains("no vector has the model's dimension"),
      e.getMessage)
    // and the healthy path still projects everything
    assert(Decomp.pcaProject(axisCorpus(30, 4), model).count() === 30)
  }

  test("CovBuffer: merging buffers of different dims repacks exactly " +
      "(the ragged-across-partitions path)") {
    import java.math.{BigDecimal => JBD}
    val agg = graft.functions.CovMomentsAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(null))
    def bufOf(vs: Seq[Array[Double]]): graft.functions.CovBuffer = {
      val b = agg.createAggregationBuffer()
      // replicate update()'s arithmetic directly on the buffer
      vs.foreach { v =>
        b.growTo(v.length)
        for (i <- v.indices) {
          b.sums(i) = b.sums(i).add(new JBD(java.lang.Double.toString(v(i)))
            .setScale(18, java.math.RoundingMode.HALF_UP))
          b.counts(i) += 1
          for (j <- i until v.length) {
            val k = b.pairIdx(i, j)
            b.sums(k) = b.sums(k).add(
              new JBD(java.lang.Double.toString(v(i) * v(j)))
                .setScale(18, java.math.RoundingMode.HALF_UP))
            b.counts(k) += 1
          }
        }
      }
      b
    }
    val small = bufOf(Seq(Array(1.5, -2.0)))          // d=2 partition
    val big = bufOf(Seq(Array(0.5, 3.0, -1.0)))       // d=3 partition
    // merge small INTO big and (serialize-roundtripped) big INTO small:
    // both must equal the single-partition accumulation of all rows
    val want = bufOf(Seq(Array(1.5, -2.0), Array(0.5, 3.0, -1.0)))
    val m1 = agg.merge(bufOf(Seq(Array(0.5, 3.0, -1.0))), small)
    val m2 = agg.merge(bufOf(Seq(Array(1.5, -2.0))),
      agg.deserialize(agg.serialize(big)))
    Seq(("small→big", m1), ("big→small(grown)", m2)).foreach { case (tag, m) =>
      assert(m.d === want.d, tag)
      for (k <- 0 until want.size(want.d)) {
        assert(m.sums(k).compareTo(want.sums(k)) == 0, s"$tag sums($k)")
        assert(m.counts(k) === want.counts(k), s"$tag counts($k)")
      }
    }
    // the d=2 rows never saw dim 2: its groups must show the count gap
    // pcaFit's fail-loud check keys on
    assert(want.counts(2) === 1L && want.counts(0) === 2L)
  }

  test("pcaFit covariance pass: one partial+final ObjectHashAggregate " +
      "(model-sized buffers merge, rows never shuffle)") {
    val df = axisCorpus(60, 5)
      .select(col("embedding").cast("array<double>").as("v"))
      .agg(graft.functions.CovMomentsAgg.covMoments(col("v")).as("m"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val objAggs = "ObjectHashAggregate".r.findAllIn(plan).length
    assert(objAggs >= 2,
      s"cov_moments must partial-aggregate per partition:\n$plan")
    assert(plan.contains("cov_moments"), plan)
  }

  test("pcaProject: pure scan — no exchange, no join in the plan") {
    val corpus = axisCorpus(30, 4)
    val model = Decomp.pcaFit(corpus, k = 2, iters = 8)
    val df = Decomp.pcaProject(corpus, model)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"projection must not join:\n$plan")
  }

  // ---- p101 composition: SemDeDup over PCA-reduced vectors ----------------

  test("PCA-reduced semDedup: exact twins drop against the smaller id") {
    import graft.operators.Similarity
    // corpus with two exact twin pairs: (7,33) and (12,41)
    val base = axisCorpus(50, 8, seed = 43L).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val twinned = base.map {
      case (33L, _) => (33L, base.find(_._1 == 7L).get._2)
      case (41L, _) => (41L, base.find(_._1 == 12L).get._2)
      case other    => other
    }
    val corpus = twinned.toSeq.toDF("vec_id", "embedding")
    val model = Decomp.pcaFit(corpus, k = 3, iters = 16)
    val reduced = Decomp.pcaProject(corpus, model)
      .select(col("vec_id"),
        array(col("pc1"), col("pc2"), col("pc3")).as("rv"))
    val bank = Similarity.ivfCentroidsTrained(reduced, nCells = 4, iters = 2,
      vecCol = "rv", stride = 5)
    val out = Similarity.semDedup(reduced, threshold = 0.999999,
        centroids = bank, vecCol = "rv")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    // identical vectors project identically → same cell, cosine exactly 1
    assert(out(7L)._1, "smaller twin must be kept")
    assert(!out(33L)._1 && out(33L)._2 == 7L, s"33 must drop to 7: ${out(33L)}")
    assert(!out(41L)._1 && out(41L)._2 == 12L, s"41 must drop to 12: ${out(41L)}")
    // in 3-d reduced space unconstructed near-parallel pairs may also
    // qualify — require only that every drop points at a smaller id
    assert(out.forall { case (id, (kept, dupOf)) => kept || dupOf < id },
      s"drops must point at smaller ids: $out")
  }

  // ---- p102 composition: tokenizer fertility by language ------------------

  test("token fertility: identical text across langs gives identical ratios") {
    import graft.operators.Vocab
    import graft.functions.{TextFunctions => TF}
    val text = "alpha beta alpha gamma beta alpha delta"
    val docs = Seq((1L, "en", text), (2L, "de", text), (3L, "de", text))
      .toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"), TF.tokens(col("text")).as("toks"))
    val words = docs.select(explode(col("toks")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val merges = Vocab.bpeTrain(words, "word", "cnt", merges = 4)
      .orderBy("step").select("left_sym", "right_sym")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val applied = Vocab.applyMergesDf(words.select(col("word")), "word", merges)
    val out = docs.select(col("lang"), explode(col("toks")).as("word"))
      .join(applied, "word")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_subtokens")).as("n_bpe"),
        sum(length(col("word")).cast("long")).as("n_chars"))
      .select(col("lang"), col("n_words"),
        (col("n_bpe").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_bpe").cast("double"))
          .as("cpt"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("en")._1 == 7 && out("de")._1 == 14, s"word counts: $out")
    // same text ⇒ identical per-word tokenization ⇒ identical ratios
    assert(out("en")._2 == out("de")._2, s"fertility must match: $out")
    assert(out("en")._3 == out("de")._3, s"chars/token must match: $out")
    assert(out("en")._2 >= 1.0, "every word is at least one subtoken")
    assert(out("en")._3 > 0.0)
  }
}
