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
}
