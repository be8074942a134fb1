package graft

import graft.functions.{GraftFunctions, HashFunctions, TextFunctions => TF}
import org.apache.spark.sql.functions._

/** The pure-SQL surface: custom expressions registered as session functions
  * must agree with their Scala-API forms. */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("a typed Aggregator registers as a SQL UDAF and matches groupBy") {
    import graft.core.FoldAggregator
    import org.apache.spark.sql.{functions => F}
    // geometric-mean-free exact fold: (sum, count) buffer -> sum*count,
    // something a built-in doesn't provide directly
    val sumTimesCount = FoldAggregator[Long, (Long, Long), Long](
      (0L, 0L),
      (b, v) => (b._1 + v, b._2 + 1),
      (a, b) => (a._1 + b._1, a._2 + b._2),
      b => b._1 * b._2)
    spark.udf.register("sum_times_count", F.udaf(sumTimesCount))
    Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v")
      .createOrReplaceTempView("udaf_t")
    val got = spark.sql(
      """SELECT k, sum_times_count(v) AS stc FROM udaf_t
        |GROUP BY k ORDER BY k""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 60L), (2L, 5L))) // (10+20)*2, 5*1
  }

  test("registered SQL functions match the Scala API results") {
    GraftFunctions.register(spark)
    Seq(("Hello, World! 42x", 7L)).toDF("text", "x")
      .createOrReplaceTempView("t")

    val viaSql = spark.sql(
      """SELECT tokenize(text) AS toks,
        |  token_shingles(tokenize(text), 2) AS sh,
        |  simhash64(tokenize(text)) AS sh64,
        |  fingerprint64(text) AS fp,
        |  minhash_signature(tokenize(text), 16, 7) AS sig,
        |  cosine_similarity(array(1.0D, 0.0D), array(1.0D, 1.0D)) AS cos,
        |  hll_rho(fingerprint64(text), 8) AS rho
        |FROM t""".stripMargin).head()

    val viaApi = Seq(("Hello, World! 42x", 7L)).toDF("text", "x")
      .select(
        TF.tokens(col("text")).as("toks"),
        TF.tokenShingles(TF.tokens(col("text")), 2).as("sh"),
        HashFunctions.simhash64(TF.tokens(col("text"))).as("sh64"),
        HashFunctions.fingerprint64(col("text")).as("fp"),
        HashFunctions.minhashSignature(TF.tokens(col("text")), 16, 7L).as("sig"),
        graft.functions.VectorFunctions.cosine(
          array(lit(1.0), lit(0.0)), array(lit(1.0), lit(1.0))).as("cos"),
        HashFunctions.hllRho(
          HashFunctions.fingerprint64(col("text")), 8).as("rho"))
      .head()

    assert(viaSql.getSeq[String](0) === viaApi.getSeq[String](0))
    assert(viaSql.getSeq[String](1) === viaApi.getSeq[String](1))
    assert(viaSql.getLong(2) === viaApi.getLong(2))
    assert(viaSql.getLong(3) === viaApi.getLong(3))
    assert(viaSql.getSeq[Long](4) === viaApi.getSeq[Long](4))
    assert(viaSql.getDouble(5) === viaApi.getDouble(5))
    assert(viaSql.getInt(6) === viaApi.getInt(6))
  }

  test("GraftExtensions installs the SQL functions at session build") {
    import org.apache.spark.sql.SparkSession
    spark // ensure the shared context exists first
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val extSession = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val got = extSession
        .sql("SELECT fingerprint64('a') AS fp, simhash64(tokenize('a b')) AS sh")
        .head()
      assert(got.getLong(0) ===
        graft.functions.Hash64.mix(graft.functions.Hash64.fnv1a("a".getBytes("UTF-8"))))
      assert(got.getLong(1) !== 0L)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("minhash_signature rejects non-literal numHashes") {
    GraftFunctions.register(spark)
    Seq("x").toDF("text").createOrReplaceTempView("t2")
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_signature(tokenize(text), length(text)) FROM t2")
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }
}
