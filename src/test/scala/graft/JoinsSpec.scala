package graft

import graft.operators.Joins

/** As-of join semantics on literal data: inclusive match, latest-wins,
  * no-match → null, keys don't leak across groups. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join picks the latest right row at or before each left time") {
    val left = Seq(
      (1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"),
      (2L, 10L, "q1")).toDF("k", "t", "name")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 99L, 999.0))
      .toDF("k", "t", "v")

    val got = Joins.asOf(left, right, keyCol = "k", timeCol = "t",
        asofCols = Seq("v"))
      .select("name", "asof_v").as[(String, Option[Double])]
      .collect().toMap

    assert(got("p0") === None)          // before any right row
    assert(got("p1") === Some(100.0))   // inclusive: right at t=10 matches
    assert(got("p2") === Some(150.0))   // latest of {10, 15}
    assert(got("q1") === None)          // other key's rows don't leak
  }

  test("forward as-of picks the earliest right row at or after each left time") {
    val left = Seq(
      (1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 99L, "p3"),
      (2L, 10L, "q1")).toDF("k", "t", "name")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 5L, 999.0))
      .toDF("k", "t", "v")

    val got = Joins.asOf(left, right, keyCol = "k", timeCol = "t",
        asofCols = Seq("v"), direction = "forward")
      .select("name", "asof_v").as[(String, Option[Double])]
      .collect().toMap

    assert(got("p1") === Some(100.0))   // inclusive: right at t=10 matches
    assert(got("p2") === None)          // nothing at or after 20 for key 1
    assert(got("p3") === None)
    assert(got("q1") === None)          // key 2's right row is in the past
  }

  test("tolerance nulls matches farther than the bound, both directions") {
    val left = Seq(
      (1L, 100L, "near"), (1L, 200L, "far"), (1L, 40L, "none"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 95L, 1.0), (1L, 150L, 2.0)).toDF("k", "t", "v")

    val back = Joins.asOf(left, right, "k", "t", Seq("v"),
        tolerance = Some(10L))
      .select("name", "asof_v").as[(String, Option[Double])]
      .collect().toMap
    assert(back("near") === Some(1.0))  // 100-95 = 5 <= 10
    assert(back("far") === None)        // 200-150 = 50 > 10
    assert(back("none") === None)       // no right row at or before 40

    val fwd = Joins.asOf(left, right, "k", "t", Seq("v"),
        direction = "forward", tolerance = Some(60L))
      .select("name", "asof_v").as[(String, Option[Double])]
      .collect().toMap
    assert(fwd("none") === Some(1.0))   // 95-40 = 55 <= 60
    assert(fwd("near") === Some(2.0))   // 150-100 = 50 <= 60
    assert(fwd("far") === None)         // nothing at or after 200
  }

  test("validateUnique rejects duplicate (key, time) right rows") {
    val left = Seq((1L, 10L, "p1")).toDF("k", "t", "name")
    val dupRight = Seq((1L, 10L, 100.0), (1L, 10L, 101.0)).toDF("k", "t", "v")
    val cleanRight = Seq((1L, 10L, 100.0), (1L, 11L, 101.0)).toDF("k", "t", "v")

    // clean right passes with the check on
    val ok = Joins.asOf(left, cleanRight, "k", "t", Seq("v"),
        validateUnique = true)
      .select("asof_v").as[Double].collect()
    assert(ok.toSeq === Seq(100.0))

    val err = intercept[Exception] {
      Joins.asOf(left, dupRight, "k", "t", Seq("v"),
        validateUnique = true).collect()
    }
    assert(err.getMessage != null)
  }

  test("as-of join stays correct under a heavily skewed hot key") {
    // one hot key carries 5000 right rows and 1000 probes; a cold key rides
    // along to prove group isolation under the same shuffle
    val hotRight = (0L until 5000L).map(t => (7L, t * 2, t.toDouble))
    val right = (hotRight :+ ((8L, 0L, -1.0))).toDF("k", "t", "v")
    val left = ((0L until 1000L).map(t => (7L, t * 10 + 1, s"h$t")) :+
      ((8L, 50L, "cold"))).toDF("k", "t", "name")

    val got = Joins.asOf(left, right, "k", "t", Seq("v"),
        validateUnique = true)
      .select("name", "asof_v").as[(String, Double)].collect().toMap

    // probe at t = 10i + 1 → latest right time ≤ that is 10i → v = 5i
    assert((0 until 1000).forall(i => got(s"h$i") === 5.0 * i))
    assert(got("cold") === -1.0)
  }

  test("saltedJoin is row-identical to the plain join, hot key included") {
    import graft.operators.Skew
    // key 7 is hot on the left (10k rows); right has multiple rows per key
    // so the join fans out — salting must not duplicate or drop fanout rows
    val left = ((0L until 10000L).map(i => (7L, i)) ++
      (0L until 100L).map(i => (i % 5, i))).toDF("k", "lv")
    val right = (0L until 20L).map(i => (i % 10, i)).toDF("k", "rv")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.select("k", "lv", "rv").as[(Long, Long, Long)]
        .collect().toSeq.sorted
    val plain = canon(left.join(right, "k"))
    assert(plain.nonEmpty)
    assert(canon(Skew.saltedJoin(left, right, Seq("k"), salts = 8)) === plain)
    assert(canon(Skew.saltedJoin(left, right, Seq("k"), salts = 1)) === plain)
  }

  test("intervalOverlap: half-open semantics, exactly-once across bins, empty intervals dropped") {
    val a = Seq(
      (1L, 10L, 20L, "a1"),   // overlaps b1 ([15,25)) and b3 ([0,100))
      (1L, 20L, 30L, "a2"),   // touches b1's end at 25 → overlaps; NOT a1
      (1L, 40L, 40L, "a3"),   // empty interval → matches nothing
      (2L, 10L, 20L, "a4"))   // same times, other key → only its own b
      .toDF("k", "a_s", "a_e", "a_name")
    val b = Seq(
      (1L, 15L, 25L, "b1"),
      (1L, 20L, 20L, "b2"),   // empty → nothing, even inside a2
      (1L, 0L, 100L, "b3"),   // spans MANY 7-wide bins → each pair once
      (2L, 19L, 21L, "b4"),
      (2L, 20L, 30L, "b5"))   // [20,30) vs a4 [10,20): touching, no overlap
      .toDF("k", "b_s", "b_e", "b_name")
    val got = Joins.intervalOverlap(a, b, Seq("k"),
        "a_s", "a_e", "b_s", "b_e", binWidth = 7L)
      .select("a_name", "b_name").as[(String, String)].collect().toSeq.sorted
    assert(got === Seq(("a1", "b1"), ("a1", "b3"), ("a2", "b1"),
      ("a2", "b3"), ("a4", "b4")))
  }

  test("intervalOverlap matches the naive predicate join on random intervals, any bin width") {
    val rnd = new scala.util.Random(91)
    val mk = (n: Int, tag: String) => (0 until n).map { i =>
      val s = rnd.nextInt(1000).toLong
      (rnd.nextInt(4).toLong, s, s + rnd.nextInt(120).toLong, s"$tag$i")
    }
    val a = mk(300, "a").toDF("k", "a_s", "a_e", "a_name")
    val b = mk(300, "b").toDF("k", "b_s", "b_e", "b_name")
    // the classic predicate alone wrongly matches an EMPTY interval that
    // the other side strictly spans ([10,10) ∩ [5,15) = ∅ but 10<15 ∧ 5<10)
    // — true overlap additionally requires both intervals nonempty
    val naive = a.join(b, Seq("k"))
      .filter($"a_s" < $"b_e" && $"b_s" < $"a_e" &&
        $"a_s" < $"a_e" && $"b_s" < $"b_e")
      .select("a_name", "b_name").as[(String, String)]
      .collect().toSeq.sorted
    assert(naive.nonEmpty)
    Seq(1L, 13L, 128L, 5000L).foreach { w =>
      val got = Joins.intervalOverlap(a, b, Seq("k"),
          "a_s", "a_e", "b_s", "b_e", binWidth = w)
        .select("a_name", "b_name").as[(String, String)]
        .collect().toSeq.sorted
      val extra = got.diff(naive).take(5)
      val missing = naive.diff(got).take(5)
      assert(got === naive,
        s"binWidth=$w diverges: extra=$extra missing=$missing " +
          s"sizes ${got.size} vs ${naive.size}")
    }
  }
}
