package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** Session-extension entry point: installs the engine's SQL functions at
  * session build, the standard deployment hook for a Spark library —
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   // or: SparkSession.builder().withExtensions(new GraftExtensions)
  *
  * Equivalent to calling [[graft.functions.GraftFunctions.register]] on an
  * existing session; this form needs no code on the user side. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def inject(e: SparkSessionExtensions, name: String, usage: String,
      builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

  override def apply(e: SparkSessionExtensions): Unit = {
    inject(e, "tokenize",
      "tokenize(text) - lowercase alphanumeric tokens",
      args => TokenizeExpr(args.head))
    inject(e, "token_shingles",
      "token_shingles(tokens, n) - word n-gram shingles",
      GraftFunctions.tokenShinglesBuilder)
    inject(e, "simhash64",
      "simhash64(tokens) - 64-bit SimHash",
      args => TokenSimHash64(args.head))
    inject(e, "fingerprint64",
      "fingerprint64(text) - stable 64-bit content hash",
      args => Fingerprint64(args.head))
    inject(e, "cosine_similarity",
      "cosine_similarity(a, b) - cosine of two float/double arrays",
      args => CosineSimilarityExpr(args.head, args(1)))
    inject(e, "minhash_signature",
      "minhash_signature(shingles[, numHashes[, seed]]) - MinHash slots",
      GraftFunctions.minhashBuilder)
    inject(e, "hll_rho",
      "hll_rho(hash64, p) - HLL register rank of a 64-bit hash under 2^p registers",
      GraftFunctions.hllRhoBuilder)
  }
}
