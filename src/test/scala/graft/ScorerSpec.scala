package graft

import org.apache.spark.sql.functions._

import graft.operators.Scorer

/** The trained-scorer solves: the d-feature Cholesky path must agree with
  * the closed-form 3×3 adjugate (p141's oracle-pinned machinery), solve
  * hand-checkable systems exactly, and fail loud on non-PD input. The
  * bit-exact oracle mirror of the unrolled recurrence is gated by p142;
  * these are the kernel-level contracts. */
class ScorerSpec extends SparkSpec {
  import spark.implicits._

  test("choleskySolve: identity system returns b; a hand-solvable SPD " +
      "system solves exactly") {
    val w1 = Scorer.choleskySolve(3,
      (i, j) => if (i == j) 1.0 else 0.0, i => Seq(2.0, -3.0, 0.5)(i))
    assert(w1.toSeq === Seq(2.0, -3.0, 0.5))
    // M = [[4,2],[2,2]], b = [6,4] → L = [[2,0],[1,1]], y = [3,1],
    // w = [1,1] — every intermediate is exact in binary
    val w2 = Scorer.choleskySolve(2,
      (i, j) => Seq(Seq(4.0, 2.0), Seq(2.0, 2.0))(i)(j),
      i => Seq(6.0, 4.0)(i))
    assert(w2.toSeq === Seq(1.0, 1.0))
  }

  test("choleskySolve refuses a non-positive-definite system loud") {
    val e = intercept[IllegalArgumentException] {
      // column 1 pivot: 1 - 1*1 = 0 (perfectly collinear, no ridge)
      Scorer.choleskySolve(2, (_, _) => 1.0, _ => 1.0)
    }
    assert(e.getMessage.contains("non-positive pivot"))
  }

  test("ridgeFit on 2 features agrees with the adjugate-form ridgeFit3 " +
      "to solver precision, from the same staged moments") {
    val df = Seq(
      (0L, 0.1, 0.9, 0.35), (1L, 0.5, 0.4, 0.47), (2L, 0.9, 0.2, 0.55),
      (3L, 0.3, 0.3, 0.30), (4L, 0.7, 0.8, 0.80), (5L, 0.2, 0.6, 0.44))
      .toDF("id", "f1", "f2", "y")
    val a = Scorer.ridgeFit3(df, col("f1"), col("f2"), col("y"), 0.5)
    val c = Scorer.ridgeFit(df, Seq(col("f1"), col("f2")), col("y"), 0.5)
    assert(c.length === 3)
    Seq(a.w0, a.w1, a.w2).zip(c).foreach { case (x, y) =>
      assert(math.abs(x - y) <= 1e-12 * math.max(1.0, math.abs(x)),
        s"adjugate $x vs cholesky $y")
    }
    // the scoring projections agree on the fitted weights they share
    val s3 = df.select(Scorer.score3(a, col("f1"), col("f2")).as("v"))
      .collect().map(_.getDouble(0)).toSeq
    val sN = df.select(Scorer.score(
        Seq(a.w0, a.w1, a.w2), Seq(col("f1"), col("f2"))).as("v"))
      .collect().map(_.getDouble(0)).toSeq
    assert(s3 === sN, "score() must be score3's expression shape exactly")
  }

  test("detExp: within 4 ulp of libm exp across the clamp range, exact " +
      "at 0, saturating outside [-30, 30]") {
    val ts = (-300 to 300).map(_ / 10.0) ++ Seq(-30.0, 30.0, -35.0, 40.0,
      0.0, 1e-12, -1e-12)
    val got = ts.toDF("t").select(col("t"), Scorer.detExp(col("t")).as("e"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    got.foreach { case (t, e) =>
      val want = math.exp(math.max(-30.0, math.min(30.0, t)))
      val tol = 4 * math.ulp(want)
      assert(math.abs(e - want) <= tol, s"detExp($t) = $e vs libm $want")
    }
    val z = Seq(0.0).toDF("t").select(Scorer.detExp(col("t"))).head
      .getDouble(0)
    assert(z === 1.0, "detExp(0) must be exactly 1")
    val s0 = Seq(0.0).toDF("t").select(Scorer.sigmoid(col("t"))).head
      .getDouble(0)
    assert(s0 === 0.5, "sigmoid(0) must be exactly 0.5")
  }

  test("logisticFitIrls separates a noisy threshold label and orders " +
      "probabilities by the signal feature") {
    // y = 1 iff f > 0.5, with a weak second feature as noise
    val df = (0 until 400).map { i =>
      val f = (i % 100) / 100.0
      (i.toLong, f, ((i * 7) % 13) / 13.0, if (f > 0.5) 1.0 else 0.0)
    }.toDF("id", "f", "g", "y")
    val w = Scorer.logisticFitIrls(df, Seq(col("f"), col("g")), col("y"),
      lambda = 0.1, iters = 3)
    assert(w(1) > 2.0, s"signal weight must dominate: ${w.toSeq}")
    val probs = df.select(col("f"),
        Scorer.sigmoid(Scorer.score(w.toSeq, Seq(col("f"), col("g"))))
          .as("p"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val lo = probs.filter(_._1 <= 0.2).map(_._2).max
    val hi = probs.filter(_._1 >= 0.8).map(_._2).min
    assert(lo < 0.5 && hi > 0.5 && hi > lo,
      s"probabilities must separate the classes: lo=$lo hi=$hi")
  }

  test("ridgeFitStd: the z-scored fit survives pathologically mis-scaled " +
      "features where the raw fit's penalty lands asymmetrically, uses " +
      "the SAME one-scan moments, and is EXACTLY invariant under " +
      "power-of-two feature rescaling") {
    // two clean signals 12 decimal orders apart in scale (the exact-
    // decimal moments buffer bounds how far a raw square can go —
    // (1e6)²·200 rows stays far inside DECIMAL(38,18)): natural raw
    // weights are 3e-6 and -1.5e6, so a raw λ=1 penalty crushes the
    // small-scale feature's coefficient (λ·w² ≈ 2e12 vs hundreds of
    // residual) while the standardized fit penalizes comparable unit-
    // variance coefficients
    val rows = (1 to 200).map { i =>
      val u1 = (i % 17) / 17.0; val u2 = (i % 23) / 23.0
      (u1 * 1e6, u2 * 1e-6, 2.0 + 3.0 * u1 - 1.5 * u2)
    }.toDF("f1", "f2", "y")
    val feats = Seq(col("f1"), col("f2"))
    def maxErr(w: Array[Double]): Double = rows
      .select(abs(Scorer.score(w.toSeq, feats) - col("y")).as("e"))
      .agg(max(col("e"))).head.getDouble(0)
    val wStd = Scorer.ridgeFitStd(rows, feats, col("y"), lambda = 1.0)
    val errStd = maxErr(wStd)
    assert(errStd < 0.05,
      s"standardized fit must recover the mixed-scale signal: $errStd")
    val errRaw = maxErr(Scorer.ridgeFit(rows, feats, col("y"), 1.0))
    assert(errRaw > 10 * errStd,
      s"the raw fit's asymmetric penalty is the hazard being fixed: " +
        s"raw $errRaw vs std $errStd")
    // scale-invariance under power-of-two rescaling: the standardized
    // SYSTEM is scale-free algebra, but the decimal staging quantizes
    // per-row products to shortest round-trip representations, and that
    // grid does not commute with binary scaling — so the unmapped
    // weights agree to staging precision (~1e-8 relative), not bits
    val scaled = rows.select((col("f1") / 1024.0).as("f1"),
      (col("f2") * 4096.0).as("f2"), col("y"))
    val wS = Scorer.ridgeFitStd(scaled,
      Seq(col("f1"), col("f2")), col("y"), lambda = 1.0)
    def rel(a: Double, b: Double): Double = math.abs(a - b) /
      math.max(math.abs(a), math.abs(b))
    assert(rel(wS(0), wStd(0)) < 1e-6 &&
      rel(wS(1) / 1024.0, wStd(1)) < 1e-6 &&
      rel(wS(2) * 4096.0, wStd(2)) < 1e-6,
      s"power-of-two rescaling must agree to staging precision: " +
        s"${wS.toSeq} vs ${wStd.toSeq}")
    // zero-variance feature refuses loud
    val e = intercept[IllegalArgumentException] {
      Scorer.ridgeFitStd(rows.withColumn("c", lit(7.0)),
        Seq(col("f1"), col("c")), col("y"), 1.0)
    }
    assert(e.getMessage.contains("zero"), e.getMessage)
  }
}
