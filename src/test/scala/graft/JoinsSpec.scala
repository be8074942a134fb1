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
}
