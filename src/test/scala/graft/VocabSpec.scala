package graft

import org.apache.spark.sql.Row
import graft.operators.Vocab

/** BPE vocabulary training: hand-checked merges, greedy run semantics, and
  * a randomized replay against an in-memory reference implementation. */
class VocabSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference: full BPE train loop with the same argmax
    * tie-break, written scan-wise (index walk), NOT fold-wise — an
    * independent formulation of the greedy contract. */
  private def refTrain(words: Seq[(String, Long)], merges: Int)
      : Seq[(String, String, Long, Long)] = {
    var syms: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => (w.split("").toVector, c) }
    val out = Vector.newBuilder[(String, String, Long, Long)]
    (1 to merges).foreach { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, c) =>
        s.indices.dropRight(1).foreach { i =>
          counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + c
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        syms = syms.map { case (s, cnt) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += s(i); i += 1 }
          }
          (b.result(), cnt)
        }
        val vocab = syms.iterator.flatMap(_._1).toSet.size.toLong
        out += ((l, r, c, vocab))
      }
    }
    out.result()
  }

  private def train(words: Seq[(String, Long)], merges: Int)
      : Seq[(String, String, Long, Long)] =
    Vocab.bpeTrain(words.toDF("word", "cnt"), "word", "cnt", merges)
      .orderBy("step").collect().toSeq
      .map(r => (r.getString(1), r.getString(2), r.getLong(4), r.getLong(5)))

  test("hand-checked merges: counts weighted by word frequency, ties on pair order") {
    // 'abab' x3, 'ab' x2: pairs (a,b) 3*2+2=8, (b,a) 3. First merge (a,b).
    val words = Seq(("abab", 3L), ("ab", 2L))
    val got = train(words, 2)
    assert(got.head._1 == "a" && got.head._2 == "b" && got.head._3 == 8L)
    // After merging: 'abab' -> [ab, ab], 'ab' -> [ab]; pair (ab,ab) count 3.
    assert(got(1)._1 == "ab" && got(1)._2 == "ab" && got(1)._3 == 3L)
  }

  test("greedy left-to-right: runs of an identical pair merge at alternate positions") {
    // 'aaaa' under (a,a): greedy yields (aa)(aa), so round-2 best pair is
    // (aa,aa) with count 1 — NOT (aa,a).
    val got = train(Seq(("aaaa", 1L)), 2)
    assert(got(0) == (("a", "a", 3L, 1L)))
    assert(got(1)._1 == "aa" && got(1)._2 == "aa" && got(1)._3 == 1L)
    // Odd run: 'aaaaa' -> (aa)(aa)a; pairs (aa,aa)=1, (aa,a)=1 -> tie breaks
    // on right symbol: ("aa","a") < ("aa","aa") lexicographically.
    val odd = train(Seq(("aaaaa", 1L)), 2)
    assert(odd(1)._1 == "aa" && odd(1)._2 == "a")
  }

  test("applyMerges tokenizes with the trained table (train/apply loop closes)") {
    val words = Seq(("lower", 2L), ("lowest", 3L), ("low", 5L))
    val merges = train(words, 4).map(m => (m._1, m._2))
    // Applying the learned merges to a training word must reproduce the
    // final symbol state bpeTrain reached for it.
    val viaApply = Vocab.applyMerges("lowest", merges)
    val ref = refTrain(words, 4)
    assert(ref.map(m => (m._1, m._2)) == merges)
    // And the apply fold agrees with the reference's scan-wise merging.
    var refSyms = "lowest".split("").toVector
    merges.foreach { case (l, r) =>
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < refSyms.length) {
        if (i + 1 < refSyms.length && refSyms(i) == l && refSyms(i + 1) == r) {
          b += (l + r); i += 2
        } else { b += refSyms(i); i += 1 }
      }
      refSyms = b.result()
    }
    assert(viaApply == refSyms)
  }

  test("applyMergesDf == driver applyMerges on random words") {
    val rnd = new scala.util.Random(95)
    val words = (1 to 40).map(_ =>
      Vector.fill(1 + rnd.nextInt(8))("ab" (rnd.nextInt(2))).mkString)
      .distinct
    val merges = Seq(("a", "a"), ("b", "b"), ("aa", "b"), ("a", "bb"))
    val got = Vocab.applyMergesDf(words.toDF("word"), "word", merges)
      .select("word", "n_subtokens")
      .as[(String, Long)].collect().toMap
    words.foreach { w =>
      assert(got(w) === Vocab.applyMerges(w, merges).size.toLong, s"word $w")
    }
  }

  test("randomized replay: distributed train == in-memory reference") {
    val rnd = new scala.util.Random(90)
    val alphabet = "abc"
    val words = (1 to 60).map { _ =>
      val len = 1 + rnd.nextInt(6)
      (Vector.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
        (1 + rnd.nextInt(5)).toLong)
    }.distinct.map { case (w, c) => (w, c) }
    val got = train(words, 6)
    val want = refTrain(words, 6)
    assert(got == want)
  }

  /** In-memory reference of the BATCHED trainer (greedy first-fit
    * disjoint acceptance over the ranked pool, scan-wise ONE-PASS batch
    * application) — an independent formulation of [[Vocab.bpeTrainBatched]]
    * (which folds, and applies the batch through a branch chain). */
  private def refTrainBatched(words: Seq[(String, Long)], merges: Int,
      maxPerRound: Int, poolFactor: Int, maxRounds: Int)
      : Seq[(Int, Int, String, String, Long, Long)] = {
    var syms: Seq[(Vector[String], Long)] =
      words.map { case (w, c) => (w.split("").toVector, c) }
    val out = Vector.newBuilder[(Int, Int, String, String, Long, Long)]
    var emitted = 0
    var round = 1
    var done = false
    while (!done && emitted < merges && round <= maxRounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, c) =>
        s.indices.dropRight(1).foreach { i =>
          counts((s(i), s(i + 1))) =
            counts.getOrElse((s(i), s(i + 1)), 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        val pool = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }
          .take(maxPerRound * poolFactor)
        val seen = scala.collection.mutable.Set.empty[String]
        val batch =
          scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        pool.foreach { case ((l, r), c) =>
          val ss = Seq(l, r, l + r)
          if (batch.size < maxPerRound && ss.forall(!seen.contains(_))) {
            batch += ((l, r, c))
            seen ++= ss
          }
        }
        val bm = batch.map { case (l, r, _) => (l, r) -> (l + r) }.toMap
        syms = syms.map { case (s, cnt) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && bm.contains((s(i), s(i + 1)))) {
              b += bm((s(i), s(i + 1))); i += 2
            } else { b += s(i); i += 1 }
          }
          (b.result(), cnt)
        }
        val vocab = syms.iterator.flatMap(_._1).toSet.size.toLong
        batch.iterator.zipWithIndex.foreach { case ((l, r, c), k) =>
          val step = emitted + k + 1
          if (step <= merges) out += ((step, round, l, r, c, vocab))
        }
        emitted = math.min(merges, emitted + batch.size)
        round += 1
      }
    }
    out.result()
  }

  private def trainBatched(words: Seq[(String, Long)], merges: Int,
      maxPerRound: Int, poolFactor: Int = 8, maxRounds: Int = 16)
      : Seq[(Int, Int, String, String, Long, Long)] =
    Vocab.bpeTrainBatched(words.toDF("word", "cnt"), "word", "cnt", merges,
        maxPerRound, poolFactor, maxRounds)
      .orderBy("step").collect().toSeq
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
        r.getLong(5), r.getLong(6)))

  test("bpeTrainBatched with maxPerRound=1 degenerates to the sequential " +
      "trainer exactly") {
    val words = Seq(("lower", 2L), ("lowest", 3L), ("low", 5L), ("wet", 4L))
    val seq = train(words, 6)
    val bat = trainBatched(words, 6, maxPerRound = 1, maxRounds = 6)
    assert(bat.map(m => (m._3, m._4, m._5, m._6)) === seq)
    // with one merge per round, round == step
    assert(bat.forall(m => m._1 == m._2))
  }

  test("bpeTrainBatched == in-memory batched reference; rounds are " +
      "symbol-disjoint; one fold pass == sequential within-round apply") {
    val rnd = new scala.util.Random(97)
    val alphabet = "abcd"
    val words = (1 to 80).map { _ =>
      val len = 2 + rnd.nextInt(7)
      (Vector.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
        (1 + rnd.nextInt(9)).toLong)
    }.distinct
    // merges set above what maxRounds * maxPerRound can reach: every
    // applied merge is then also EMITTED, so the sequential re-application
    // check below sees the full table (a truncated final round applies
    // merges it doesn't emit — that contract is pinned by `got === want`)
    val got = trainBatched(words, 60, maxPerRound = 6, poolFactor = 4,
      maxRounds = 8)
    val want = refTrainBatched(words, 60, 6, 4, 8)
    assert(got === want)
    // batches within a round never share a symbol (l, r, or merged) —
    // the property that makes the one-pass application exact
    got.groupBy(_._2).foreach { case (round, ms) =>
      val sets = ms.map(m => Set(m._3, m._4, m._3 + m._4))
      sets.combinations(2).foreach { case Seq(a, b) =>
        assert(a.intersect(b).isEmpty, s"round $round shares symbols")
      }
    }
    // applying the merge table SEQUENTIALLY (driver fold, step order) must
    // land on the same tokenization the batched one-pass folds produced:
    // the final vocab size matches the distinct symbols after sequential
    // application of the full table
    val merges = got.map(m => (m._3, m._4))
    val finalSyms = words.flatMap { case (w, _) =>
      Vocab.applyMerges(w, merges) }.toSet
    assert(finalSyms.size.toLong === got.last._6,
      "sequential re-application diverged from the batched fold state")
  }
}
