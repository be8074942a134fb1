package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit hashing primitives for the dedup/fingerprint
  * operators, implemented as native Catalyst `Expression`s (preference order
  * per the build brief: compose built-ins > custom Expression > UDF).
  *
  * The reference has no hashing operators at all (its only hash is Akka's
  * consistent-hash router on the shuffle key, `/root/reference/Worker.fs:40-43`);
  * these are north-star extensions for near-duplicate detection at scale.
  *
  * All hashes are seed-stable across JVMs/executors: FNV-1a over UTF-8 bytes
  * plus a SplitMix64 finalizer — no dependence on JVM `hashCode`.
  */
object Hash64 {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  def fnv1a(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }

  def fnv1a(s: UTF8String): Long = fnv1a(s.getBytes)

  /** SplitMix64 finalizer — decorrelates seeds / mixes FNV output. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** SimHash over a token (or shingle) array: per-token 64-bit hash, signed
  * bit-vote across tokens, sign of each vote becomes the output bit. Docs
  * within small Hamming distance of each other are near-duplicates.
  * Null/empty input → 0L. */
case class TokenSimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.simhash64($c)")

  override protected def withNewChildInternal(c: Expression): TokenSimHash64 =
    copy(child = c)
}

/** MinHash signature over a shingle array: `numHashes` independent
  * permutations h_j(x) = a_j * fnv(x) + b_j (mod 2^64, a_j odd), minimum over
  * all shingles per permutation. Two docs' estimated Jaccard similarity is
  * the fraction of matching signature slots. Empty input → Long.MaxValue
  * slots (matches nothing real). */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  require(numHashes > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  // seed-derived permutation coefficients, generated once per executor
  @transient private lazy val coefA: Array[Long] =
    Array.tabulate(numHashes)(j => Hash64.mix(seed + 2L * j) | 1L)
  @transient private lazy val coefB: Array[Long] =
    Array.tabulate(numHashes)(j => Hash64.mix(seed + 2L * j + 1L))

  override def nullSafeEval(input: Any): Any =
    GraftKernels.minhash(input.asInstanceOf[ArrayData], coefA, coefB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // coefficient banks travel as reference objects into the generated class
    val aRef = ctx.addReferenceObj("minhashCoefA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("minhashCoefB", coefB, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftKernels.minhash($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

/** Stable 64-bit content fingerprint of a string (FNV-1a + SplitMix64 mix) —
  * the "document fingerprinting" primitive; also the base hash for
  * shingle-level rolling fingerprints. Null-safe. */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fingerprint64"
  override def nullSafeEval(input: Any): Any =
    GraftKernels.fingerprint64(input.asInstanceOf[UTF8String])

  /** Codegen via the static kernel — stays inside whole-stage codegen. */
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.fingerprint64($c)")

  override protected def withNewChildInternal(c: Expression): Fingerprint64 =
    copy(child = c)
}

/** HLL register rank of a 64-bit hash under 2^p registers: 1 + leading
  * zeros of `hash >>> p` within its (64−p)-bit window (see
  * [[GraftKernels.hllRho]]). Pure integer — DuckDB-replayable. */
case class HllRhoExpr(child: Expression, p: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(p >= 4 && p <= 16)
  // analysis-time type check: a non-BIGINT hash column is a coherent user
  // error, not a runtime ClassCastException from the eval cast below
  // (type inferred — AbstractDataType is private[sql] and unnameable here)
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hll_rho"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.hllRho(input.asInstanceOf[Long], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.hllRho($c, $p)")

  override protected def withNewChildInternal(c: Expression): HllRhoExpr =
    copy(child = c)
}

object HashFunctions {
  /** hll_rho(hash64, p): the HLL register rank of a 64-bit hash. */
  def hllRho(hash: Column, p: Int): Column =
    ColumnBridge.column(HllRhoExpr(ColumnBridge.expression(hash), p))

  /** simhash64(tokens): 64-bit SimHash of a token array. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(TokenSimHash64(ColumnBridge.expression(tokens)))

  /** minhash_signature(shingles): array of `numHashes` MinHash slots. */
  def minhashSignature(shingles: Column, numHashes: Int = 64,
      seed: Long = 42L): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shingles), numHashes, seed))

  /** fingerprint64(text): stable 64-bit content hash. */
  def fingerprint64(text: Column): Column =
    ColumnBridge.column(Fingerprint64(ColumnBridge.expression(text)))
}
