package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL surface for the engine's custom expressions: after
  * `GraftFunctions.register(spark)`, `spark.sql` queries can call
  * `tokenize`, `token_shingles`, `simhash64`, `minhash_signature`,
  * `fingerprint64`, `cosine_similarity`, and `hyperplane_buckets` directly —
  * the library is usable from pure SQL, not only the Scala API.
  */
object GraftFunctions {

  private[graft] def literalInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  private[graft] def literalLong(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  /** minhash_signature(shingles[, numHashes[, seed]]) builder (shared with
    * [[graft.GraftExtensions]]). */
  private[graft] val minhashBuilder: Seq[Expression] => Expression = {
    case Seq(c) => MinHashSignature(c, 64, 42L)
    case Seq(c, n) => MinHashSignature(c, literalInt(n, "numHashes"), 42L)
    case Seq(c, n, s) =>
      MinHashSignature(c, literalInt(n, "numHashes"), literalLong(s, "seed"))
    case args => throw new IllegalArgumentException(
      s"minhash_signature takes 1-3 args, got ${args.size}")
  }

  /** hll_rho(hash64, p) builder with an arity check (shared with
    * [[graft.GraftExtensions]]) — a 1-arg call is a user error, not an
    * IndexOutOfBoundsException. */
  private[graft] val hllRhoBuilder: Seq[Expression] => Expression = {
    case Seq(h, p) => HllRhoExpr(h, literalInt(p, "p"))
    case args => throw new IllegalArgumentException(
      s"hll_rho takes exactly 2 args (hash64, p), got ${args.size}")
  }

  /** token_shingles(tokens, n) builder with the same arity discipline. */
  private[graft] val tokenShinglesBuilder: Seq[Expression] => Expression = {
    case Seq(t, n) => TokenShinglesExpr(t, literalInt(n, "n"))
    case args => throw new IllegalArgumentException(
      s"token_shingles takes exactly 2 args (tokens, n), got ${args.size}")
  }

  def register(spark: SparkSession): Unit = {
    ColumnBridge.registerFunction(spark, "tokenize",
      args => TokenizeExpr(args.head))
    ColumnBridge.registerFunction(spark, "token_shingles", tokenShinglesBuilder)
    ColumnBridge.registerFunction(spark, "simhash64",
      args => TokenSimHash64(args.head))
    ColumnBridge.registerFunction(spark, "fingerprint64",
      args => Fingerprint64(args.head))
    ColumnBridge.registerFunction(spark, "cosine_similarity",
      args => CosineSimilarityExpr(args.head, args(1)))
    ColumnBridge.registerFunction(spark, "minhash_signature", minhashBuilder)
    ColumnBridge.registerFunction(spark, "hll_rho", hllRhoBuilder)
  }
}
