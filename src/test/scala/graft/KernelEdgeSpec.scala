package graft

import graft.functions.{HashFunctions, TextFunctions => TF, VectorFunctions => VF}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Edge cases for the native kernels: empty/degenerate inputs, unicode,
  * n=1 shingles, mismatched vector lengths — and a recall property for
  * MinHash-LSH at high-recall parameters. */
class KernelEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("tokenize: unicode letters are separators, digits kept, empty-safe") {
    val got = Seq("Café #42 naïve", "", "ÀÉÎ", "a1b2").toDF("text")
      .select(TF.tokens(col("text"))).as[Seq[String]].collect()
    assert(got(0) === Seq("caf", "42", "na", "ve")) // non-ascii = separator
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq("a1b2"))
  }

  test("token shingles: n=1 is the identity, empty array yields one empty shingle") {
    val df = Seq(Seq("a", "b"), Seq.empty[String]).toDF("toks")
    val s1 = df.select(TF.tokenShingles(col("toks"), 1)).as[Seq[String]].collect()
    assert(s1(0) === Seq("a", "b"))
    assert(s1(1) === Seq(""))   // short-doc fallback: join of zero tokens
  }

  test("minhash/simhash: empty input is stable and non-matching") {
    val df = Seq(Seq.empty[String], Seq.empty[String], Seq("x")).toDF("sh")
    val sigs = df.select(HashFunctions.minhashSignature(col("sh"), 8))
      .as[Seq[Long]].collect()
    assert(sigs(0) === sigs(1))
    assert(sigs(0).forall(_ == Long.MaxValue))
    assert(sigs(0) !== sigs(2))
    val hs = df.select(HashFunctions.simhash64(col("sh"))).as[Long].collect()
    assert(hs(0) === 0L)
  }

  test("cosine: mismatched lengths use the common prefix; null yields null") {
    val df = Seq((Seq(1.0f, 0.0f, 5.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
    // mismatched lengths compare the common prefix only: (1,0)·(1,0) = 1
    val got = df.select(VF.cosine(col("a"), col("b"))).as[Double].head()
    assert(got === 1.0)
    val withNull = df.select(VF.cosine(col("a"), lit(null).cast("array<float>")))
      .collect()(0)
    assert(withNull.isNullAt(0))
  }

  /** Recall property: with generous parameters (128 hashes, 64 bands → band
    * collision prob ~ j^2), every pair with true Jaccard ≥ 0.8 must surface. */
  test("minhash-LSH recall: all high-jaccard pairs found at 128/64 params") {
    val base = (1 to 200).map(i => s"w$i")
    // doc k shares (200 - k*5) leading tokens with doc 0
    val docs = (0 until 20).map { k =>
      (k.toLong, (base.drop(k * 5).take(200 - k * 5) ++
        (1 to k * 5).map(i => s"u${k}_$i")).mkString(" "))
    }.toDF("doc_id", "text")
    val shingleOf = docs.select(col("doc_id"),
      array_distinct(TF.tokenShingles(TF.tokens(col("text")), 3)).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    def trueJac(a: Long, b: Long): Double = {
      val (x, y) = (shingleOf(a).toSet, shingleOf(b).toSet)
      (x & y).size.toDouble / (x | y).size
    }
    val want = (for {
      a <- 0L until 20L; b <- (a + 1) until 20L
      if trueJac(a, b) >= 0.8
    } yield (a, b)).toSet
    assert(want.nonEmpty, "fixture should contain high-jaccard pairs")

    val got = Dedup.minhashPairs(docs, "doc_id", "text",
        numHashes = 128, bands = 64, shingleSize = 3, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(want.subsetOf(got), s"missed pairs: ${want -- got}")
  }

  test("pq codes/decode: short vectors, exact codeword round-trip, null-safe") {
    import graft.functions.VectorExpressions.{pqCodes, pqDecode}
    // 2 subspaces of 2 dims, 2 codewords each
    val banks: Array[Array[Array[Double]]] = Array(
      Array(Array(0.0, 0.0), Array(1.0, 1.0)),
      Array(Array(0.0, 1.0), Array(1.0, 0.0)))
    val df = Seq(
      (1L, Seq(1.0f, 1.0f, 1.0f, 0.0f)),   // exactly codewords (1, 1)
      (2L, Seq(0.1f, 0.1f, 0.1f, 0.9f)),   // near codewords (0, 0)
      (3L, Seq(1.0f)),                     // shorter than dim: dims skipped
      (4L, Seq.empty[Float]))              // empty: all-zero vector
      .toDF("id", "v")
    val codes = df.select(col("id"), pqCodes(col("v"), banks).as("c"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(1L) === Seq(1, 1))
    assert(codes(2L) === Seq(0, 0))
    // missing dims are SKIPPED (common-prefix contract, like cosine):
    // subspace 0 compares only dim 0 -> codeword 1 matches exactly;
    // subspace 1 has no dims in range -> all-tie -> lower id 0
    assert(codes(3L) === Seq(1, 0))
    assert(codes(4L) === Seq(0, 0))
    // decode returns the selected codewords concatenated
    val rec = df.filter(col("id") === 1L)
      .select(pqDecode(pqCodes(col("v"), banks), banks))
      .as[Seq[Double]].head()
    assert(rec === Seq(1.0, 1.0, 1.0, 0.0))
    // null vector -> null codes (UnaryExpression null semantics)
    val n = Seq((1L, null.asInstanceOf[Seq[Float]])).toDF("id", "v")
      .select(pqCodes(col("v"), banks)).collect().head
    assert(n.isNullAt(0))
  }
}
