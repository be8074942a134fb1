package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality scorer (VERDICT r14 next #6 — the last common
  * curation-operator gap): a ridge regression fit by decimal-staged
  * normal equations over one corpus scan, scored back in one codegen'd
  * scan. The heuristic quality family (p03 bar, p98 Gopher stats) is
  * rule-based; modern pipelines also run a TRAINED classifier/regressor
  * (fastText/logreg-style) — this is that operator in the engine's
  * exact-replay discipline:
  *
  *   - '''One scan, model-sized exchange.''' The Gram matrix XᵀX and
  *     moment vector Xᵀy accumulate through [[graft.functions
  *     .CovMomentsAgg]] over the packed vector [x₀..x_{d-1}, y] — each
  *     partition fuses its rows into one exact-decimal buffer and only
  *     d(d+3)/2-sized buffers cross the exchange (the
  *     [[Decomp.pcaFit]] / PcaStream machinery, reused verbatim). Exact
  *     decimal addition makes the moments associative: the fit is
  *     bit-identical under any partitioning, and an oracle replays each
  *     term with the same `Double.toString` staging.
  *   - '''Driver-side d×d solve.''' (XᵀX + λI) w = Xᵀy, solved by the
  *     explicit 3×3 adjugate for the fixed 3-feature form ([[ridgeFit3]])
  *     — a deterministic double expression tree a SQL oracle mirrors
  *     term for term (the reason the solve is closed-form, not an
  *     iterative factorization).
  *   - '''Codegen'd scoring.''' [[score3]] embeds the weights as
  *     literals: a pure projection, no shuffle, no UDF — the scan shape
  *     every 100 TB scoring pass needs.
  *
  * λ is plain Tikhonov on the WHOLE diagonal (intercept included) —
  * documented contract, chosen so the oracle's solve stays one
  * expression. Features are the caller's; the registry pairs the
  * heuristic quality sub-scores as features with the full heuristic as
  * the training label (a distillation-shaped fit whose residual is
  * nonzero because the label carries a component the features omit). */
object Scorer {

  /** Fitted ridge model for [[ridgeFit3]]: weights for
    * [1, f1, f2]. */
  final case class Ridge3(w0: Double, w1: Double, w2: Double)

  /** Normal-equation moments of ([1, f1, f2], y): the
    * [[Decomp.moments]] relation over the packed 4-vector. Rows
    * (i, j>=i) carry Σ staged(vᵢ·vⱼ); index 3 is the label, so
    * G(i,j) = s(i,j) for i,j<3 and b(i) = s(i,3). */
  def ridgeMoments3(df: DataFrame, f1: Column, f2: Column,
      label: Column): DataFrame =
    Decomp.moments(df.select(array(lit(1.0), f1.cast("double"),
      f2.cast("double"), label.cast("double")).as("__xv")), "__xv")

  /** Fit (XᵀX + λI) w = Xᵀy for x = [1, f1, f2] by the explicit 3×3
    * adjugate. The collected relation is d(d+3)/2 = 14 rows — model-sized
    * at any corpus scale. Every double expression below is mirrored
    * PARENTHESIS-FOR-PARENTHESIS by the p141 oracle; change one side only
    * with the other. */
  def ridgeFit3(df: DataFrame, f1: Column, f2: Column, label: Column,
      lambda: Double): Ridge3 = {
    val rows = ridgeMoments3(df, f1, f2, label).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2))).toMap
    def g(i: Int, j: Int): Double = rows((i, j)).doubleValue
    // symmetric M = G + λI (upper triangle read once, mirrored by name)
    val maa = g(0, 0) + lambda
    val mab = g(0, 1)
    val mac = g(0, 2)
    val mbb = g(1, 1) + lambda
    val mbc = g(1, 2)
    val mcc = g(2, 2) + lambda
    val b0 = g(0, 3); val b1 = g(1, 3); val b2 = g(2, 3)
    val cof00 = mbb * mcc - mbc * mbc
    val cof01 = mbc * mac - mab * mcc
    val cof02 = mab * mbc - mac * mbb
    val cof11 = maa * mcc - mac * mac
    val cof12 = mab * mac - maa * mbc
    val cof22 = maa * mbb - mab * mab
    val det = maa * cof00 + mab * cof01 + mac * cof02
    require(det != 0.0, "ridgeFit3: singular normal equations (det = 0) " +
      "— raise lambda or drop a collinear feature")
    Ridge3(
      ((cof00 * b0 + cof01 * b1) + cof02 * b2) / det,
      ((cof01 * b0 + cof11 * b1) + cof12 * b2) / det,
      ((cof02 * b0 + cof12 * b1) + cof22 * b2) / det)
  }

  /** Score x = [1, f1, f2] under a fitted model: weights as literals,
    * left-associated sum — one codegen'd projection. */
  def score3(model: Ridge3, f1: Column, f2: Column): Column =
    lit(model.w0) + lit(model.w1) * f1.cast("double") +
      lit(model.w2) * f2.cast("double")

  // ---- d-feature generalization (VERDICT r15 next #2) --------------------

  /** Normal-equation moments of ([1, features…], label): the
    * [[Decomp.moments]] relation over the packed (d+1)-vector — one
    * corpus scan, a d(d+3)/2-row exact-decimal buffer through the
    * exchange, exactly [[ridgeMoments3]] at any width. */
  def ridgeMoments(df: DataFrame, features: Seq[Column],
      label: Column): DataFrame =
    Decomp.moments(df.select(array(
      (lit(1.0) +: features.map(_.cast("double"))) :+
        label.cast("double"): _*).as("__xv")), "__xv")

  /** Fit (XᵀX + λI) w = Xᵀy for x = [1, features…] — the d-feature form
    * of [[ridgeFit3]] (a 3-feature ridge proves the machinery; the
    * operator a real curation pipeline runs is a 10–50-feature model).
    * The closed-form adjugate does not scale past 3×3, so the driver
    * solve is a fixed-order CHOLESKY over the collected d(d+3)/2
    * moments: sqrt/mul/sub/div are all correctly rounded under IEEE 754
    * on both engines, so the unrolled recurrence is a deterministic
    * double expression tree an oracle mirrors index for index
    * ([[graft.queries.OracleHash.choleskySolveSql]] generates the SQL
    * from THE SAME loop structure — change only together). Returns the
    * d+1 weights (intercept first). */
  def ridgeFit(df: DataFrame, features: Seq[Column], label: Column,
      lambda: Double): Array[Double] = {
    val d = features.size + 1
    val rows = ridgeMoments(df, features, label).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2))).toMap
    def g(i: Int, j: Int): Double =
      rows((math.min(i, j), math.max(i, j))).doubleValue
    choleskySolve(d,
      (i, j) => if (i == j) g(i, j) + lambda else g(i, j),
      i => g(i, d))
  }

  /** Fixed-order Cholesky solve of the SPD system M w = b: factor
    * M = L Lᵀ column by column, forward-substitute L y = b, back-
    * substitute Lᵀ w = y. Subtraction chains run in ascending k order
    * (the association the SQL mirror reproduces parenthesis for
    * parenthesis). Fails loud on a non-positive pivot — the λ ridge
    * keeps M positive definite for any feature matrix, so a
    * non-positive pivot means λ = 0 with collinear features. */
  def choleskySolve(d: Int, m: (Int, Int) => Double,
      b: Int => Double): Array[Double] = {
    val l = Array.ofDim[Double](d, d)
    for (j <- 0 until d) {
      var a = m(j, j)
      for (k <- 0 until j) a -= l(j)(k) * l(j)(k)
      require(a > 0.0, s"choleskySolve: non-positive pivot at column $j " +
        "— raise lambda or drop a collinear feature")
      l(j)(j) = math.sqrt(a)
      for (i <- j + 1 until d) {
        var s = m(i, j)
        for (k <- 0 until j) s -= l(i)(k) * l(j)(k)
        l(i)(j) = s / l(j)(j)
      }
    }
    val y = new Array[Double](d)
    for (i <- 0 until d) {
      var s = b(i)
      for (k <- 0 until i) s -= l(i)(k) * y(k)
      y(i) = s / l(i)(i)
    }
    val w = new Array[Double](d)
    for (i <- d - 1 to 0 by -1) {
      var s = y(i)
      for (k <- i + 1 until d) s -= l(k)(i) * w(k)
      w(i) = s / l(i)(i)
    }
    w
  }

  // ---- standardized (condition-robust) ridge (VERDICT r16 next #6) -------

  /** [[ridgeFit]] over Z-SCORED features — the conditioning story for
    * the 10–50-feature mixed-scale fits the wide operator is pitched
    * at. Raw-moment Gram matrices square the feature scales: one
    * feature in [0, 1e8] against one in [0, 1e-8] puts ~32 decimal
    * orders between pivots, and κ(G), not λ, then decides how many
    * digits the double Cholesky keeps; λ is also asymmetric on raw
    * scales (it crushes the small-scale feature's naturally-large
    * coefficient while barely touching the big-scale one — ScorerSpec
    * measures the resulting fit going wrong by orders of magnitude).
    * Standardization fixes both at ZERO extra passes: the z-score
    * moments are exact fixed-order algebra over the SAME collected
    * relation —
    *
    *   n = g(0,0),  μᵢ = g(0,i)/n,  σᵢ = sqrt(g(i,i)/n − μᵢ·μᵢ),
    *   Σ zᵢzⱼ = (g(i,j) − n·μᵢ·μⱼ)/(σᵢ·σⱼ),
    *   Σ zᵢy  = (g(i,d) − μᵢ·g(0,d))/σᵢ,  Σ zᵢ = 0 by construction
    *
    * — and the solved standardized weights map back to the raw scale
    * (wᵢ = sᵢ/σᵢ; w₀ = s₀ − Σ sᵢ·μᵢ/σᵢ, subtracted in ascending i), so
    * [[score]] stays one codegen'd raw-feature projection and the
    * whole fit is a deterministic double expression tree an oracle
    * mirrors index for index (the [[choleskySolve]] discipline).
    * Determinism is per-input (same rows → same bits, any
    * partitioning); across a power-of-two feature RESCALING the
    * unmapped weights agree only to ~1e-8 relative — the decimal
    * staging quantizes each per-row product to its shortest
    * round-trip representation, and that grid does not commute with
    * binary scaling (spec-pinned tolerance). λ lands
    * on the whole standardized diagonal (intercept included), the
    * [[ridgeFit3]] contract. Fails loud on a zero-variance feature —
    * drop constants; the intercept already carries them. */
  def ridgeFitStd(df: DataFrame, features: Seq[Column], label: Column,
      lambda: Double): Array[Double] = {
    val d = features.size + 1
    val rows = ridgeMoments(df, features, label).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2))).toMap
    def g(i: Int, j: Int): Double =
      rows((math.min(i, j), math.max(i, j))).doubleValue
    val n = g(0, 0)
    require(n > 0.0, "ridgeFitStd: empty corpus")
    val mu = Array.tabulate(d)(i => if (i == 0) 0.0 else g(0, i) / n)
    val sd = Array.tabulate(d) { i =>
      if (i == 0) 1.0
      else {
        val v = g(i, i) / n - mu(i) * mu(i)
        require(v > 0.0, s"ridgeFitStd: feature ${i - 1} has zero " +
          "variance — drop it (the intercept carries constants)")
        math.sqrt(v)
      }
    }
    def ms(i: Int, j: Int): Double =
      if (i == 0 && j == 0) n + lambda
      else if (i == 0 || j == 0) 0.0
      else {
        val c = (g(i, j) - n * mu(i) * mu(j)) / (sd(i) * sd(j))
        if (i == j) c + lambda else c
      }
    def bs(i: Int): Double =
      if (i == 0) g(0, d)
      else (g(i, d) - mu(i) * g(0, d)) / sd(i)
    val s = choleskySolve(d, ms, bs)
    val w = new Array[Double](d)
    var w0 = s(0)
    for (i <- 1 until d) {
      w(i) = s(i) / sd(i)
      w0 -= s(i) * mu(i) / sd(i)
    }
    w(0) = w0
    w
  }

  /** Score x = [1, features…] under fitted weights (intercept first):
    * weights as literals, left-associated sum — one codegen'd
    * projection, the [[score3]] shape at any width. */
  def score(w: Seq[Double], features: Seq[Column]): Column =
    features.zip(w.tail).foldLeft(lit(w.head): Column) {
      case (acc, (f, wi)) => acc + lit(wi) * f.cast("double")
    }

  // ---- deterministic transcendental kernel (the logistic link) -----------

  /** Range-reduction constants, shared with the oracle fragment via
    * `Double.toString` (round-trip exact both ways). ln 2 is split
    * Cody–Waite style (the classic fdlibm values): `Ln2Hi` has its low
    * mantissa bits zero, so k·Ln2Hi is EXACT for |k| ≤ 44 and the
    * reduction r = (t − k·Ln2Hi) − k·Ln2Lo loses no accuracy at the
    * clamp edges (a single-constant reduction smears ~12 ulp into
    * exp(−30) — caught by ScorerSpec's ulp gate). */
  val Ln2Hi: Double = 6.93147180369123816490e-01
  val Ln2Lo: Double = 1.90821492927058770002e-10
  val InvLn2: Double = 1.4426950408889634

  /** Taylor coefficients 1/n! for n = 0..13 — 13! is exact in a double
    * and each coefficient is one correctly-rounded division, so the
    * sequence is identical wherever it is recomputed. Degree 13 leaves
    * the truncation error below one ulp of exp(r) on |r| ≤ ln2/2. */
  val ExpCoef: Seq[Double] = {
    var f = 1.0
    (0 to 13).map { n => if (n > 0) f *= n; 1.0 / f }
  }

  /** The engine's REPRODUCIBLE exp. Libm `exp` is not correctly rounded
    * and diverges between engines (the reason the oracle discipline bans
    * it — see p92's scaladoc on ln); this kernel is pure IEEE-specified
    * arithmetic, so DuckDB replays it bit-exactly
    * ([[graft.queries.OracleHash.detExpCols]] generates the mirror from
    * THE SAME constants — change only together):
    *
    *   1. clamp t to [-30, 30] (sigmoid saturates below 1e-13 outside —
    *      and the clamp bounds the IRLS weight terms (y−p)/√s);
    *   2. k = floor(t·(1/ln2) + 0.5), r = (t − k·Ln2Hi) − k·Ln2Lo
    *      (|r| ≤ ln2/2 + ulp, Cody–Waite exact-product reduction);
    *   3. 2^k EXACTLY via an integer shift (k ∈ [-44, 44], both the
    *      shifted long and its double conversion are exact; negative k
    *      divides — powers of two divide exactly);
    *   4. exp(r) by a fixed-association degree-13 Horner over [[ExpCoef]].
    *
    * Every step is floor/mul/add/sub/div/shift — each exactly specified
    * by IEEE 754 — so the result is a deterministic function of the bits
    * of t. It is the CONTRACT exp (within 1 ulp of true exp on the
    * clamped range), not libm's. */
  def detExp(t: Column): Column = {
    val tc = greatest(least(t.cast("double"), lit(30.0)), lit(-30.0))
    val k = floor(tc * lit(InvLn2) + lit(0.5))
    val r = (tc - k * lit(Ln2Hi)) - k * lit(Ln2Lo)
    val poly = ExpCoef.init.reverse.foldLeft(lit(ExpCoef.last): Column)(
      (acc, c) => acc * r + lit(c))
    // functions.shiftleft takes only a literal shift — the SQL function
    // accepts a column; both are exact on these magnitudes
    def shl(bits: Column): Column = call_function("shiftleft", lit(1L), bits)
    val p2 = when(k >= 0, shl(k.cast("int")).cast("double"))
      .otherwise(lit(1.0) / shl((-k).cast("int")).cast("double"))
    p2 * poly
  }

  /** Logistic link under [[detExp]]: 1 / (1 + exp(−t)). */
  def sigmoid(t: Column): Column = lit(1.0) / (lit(1.0) + detExp(-t))

  // ---- IRLS logistic regression -------------------------------------------

  /** L2-regularized logistic regression fit by `iters` Newton/IRLS
    * steps, each ONE decimal-staged weighted-moments scan (VERDICT r15
    * next #2 — the operator a real curation pipeline runs is a trained
    * quality CLASSIFIER, not just a ridge):
    *
    * Per iteration, with p = [[sigmoid]](w·x) and s = p(1−p), the packed
    * per-row vector v = [√s·x₀ … √s·x_{d-1}, (y−p)/√s] runs through the
    * SAME [[graft.functions.CovMomentsAgg]] machinery as the ridge —
    * v_i·v_j accumulates XᵀSX exactly and v_i·v_d accumulates the
    * gradient Xᵀ(y−p), all in exact decimal, so the iteration is
    * bit-deterministic under any partitioning. The driver then solves
    * (XᵀSX + λI) δ = Xᵀ(y−p) − λw by [[choleskySolve]] and steps
    * w ← w + δ. A FIXED iteration count (no convergence test — a
    * data-dependent stop would make the replay's unroll depth dynamic)
    * is the pcaFit unrolled-chain precedent; 3 Newton steps reach ~1e-6
    * of the optimum on separable-ish quality labels.
    *
    * Every per-row double (the clamped link, √s, the ratios) and every
    * driver double (the solve, the step) is mirrored expression-for-
    * expression by the p143 oracle. Weights return intercept-first;
    * score probabilities with `sigmoid(score(w, features))`. */
  def logisticFitIrls(df: DataFrame, features: Seq[Column], label: Column,
      lambda: Double, iters: Int = 3): Array[Double] = {
    val dim = features.size + 1
    var w = Array.fill(dim)(0.0)
    for (_ <- 1 to iters) {
      val p = sigmoid(score(w.toSeq, features))
      val s = p * (lit(1.0) - p)
      // stage √s and the residual as MATERIALIZED columns before packing
      // (eager checkpoint, batch-of-doubles sized): inlined, the link
      // tree (degree-13 Horner included) re-expands into every array
      // element AND into the moments scan's null/size filters — the
      // optimizer collapses the single-use alias back in, the generated
      // code blows up to megabytes, and Janino compile time dwarfs the
      // scan (24 s → ~4 s on the 9-feature sf0.1 fit). The checkpoint
      // pins the per-row doubles once; the moments plan then references
      // plain columns. Same bits either way (p143's hash is the gate).
      val staged = df.select(
        (features.zipWithIndex.map { case (f, i) =>
          f.cast("double").as(s"__f$i") } :+
          sqrt(s).as("__sq") :+
          ((label.cast("double") - p) / sqrt(s)).as("__rs")): _*)
        .localCheckpoint(true)
      val packed = array(
        (col("__sq") +: features.indices.map(i =>
          col("__sq") * col(s"__f$i"))) :+ col("__rs"): _*)
      val rows = Decomp.moments(staged.select(packed.as("__xv")), "__xv")
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getDecimal(2))).toMap
      // the checkpointed stage is consumed by the moments collect above;
      // release its cached blocks now (ADVICE r16 #3 — a production
      // scorer re-fits repeatedly, and `iters` leaked frames per fit
      // would accumulate executor storage for the session lifetime)
      staged.unpersist()
      def g(i: Int, j: Int): Double =
        rows((math.min(i, j), math.max(i, j))).doubleValue
      val delta = choleskySolve(dim,
        (i, j) => if (i == j) g(i, j) + lambda else g(i, j),
        i => g(i, dim) - lambda * w(i))
      w = w.zip(delta).map { case (wi, di) => wi + di }
    }
    w
  }
}
