package graft

import graft.functions.{Hash64, HashFunctions, TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: lowercase, alphanumeric, no empties") {
    val got = Seq("Hello, World! 42x  ", "", "--!--").toDF("text")
      .select(TF.tokens(col("text"))).as[Seq[String]].collect()
    assert(got(0) === Seq("hello", "world", "42x"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
  }

  test("tokenShingles: n-grams, short-doc fallback") {
    val df = Seq("a b c d", "a").toDF("text")
    val got = df.select(TF.tokenShingles(TF.tokens(col("text")), 2))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("a b", "b c", "c d"))
    assert(got(1) === Seq("a"))
  }

  test("charShingles slide over the raw string") {
    val got = Seq("abcd").toDF("text")
      .select(TF.charShingles(col("text"), 3)).as[Seq[String]].collect()
    assert(got(0) === Seq("abc", "bcd"))
  }

  test("langId picks the language with most stopword hits, tie → code order") {
    val df = Seq(
      "the cat and the dog of it",        // en stopwords
      "der hund und die katze ist",       // de stopwords
      "xyzzy qwerty")                     // no hits anywhere → tie → "de"
      .toDF("text")
    val got = df.select(TF.langIdExpr(TF.tokens(col("text")))).as[String].collect()
    assert(got(0) === "en")
    assert(got(1) === "de")
    assert(got(2) === "de")
  }

  test("qualityScore stays in [0,1]") {
    val got = SparkEntry.queries("p03_text_quality")(spark, sfDir)
      .select(col("quality")).as[Double].collect()
    assert(got.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("p03's staged quality formula equals the canonical qualityScore") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val canonical = docs
      .select(col("doc_id"), TF.qualityScore(col("text")).as("q"))
      .as[(Long, Double)].collect().toMap
    val staged = SparkEntry.queries("p03_text_quality")(spark, sfDir)
      .select(col("doc_id"), col("quality")).as[(Long, Double)]
      .collect().toMap
    assert(staged === canonical)
  }

  test("fingerprint64 is stable and collision-free on distinct strings") {
    val g1 = Seq("a", "b", "a").toDF("text")
      .select(HashFunctions.fingerprint64(col("text"))).as[Long].collect()
    assert(g1(0) === g1(2))
    assert(g1(0) !== g1(1))
    // stable across sessions: value pinned (FNV-1a + SplitMix64 of "a")
    assert(g1(0) === Hash64.mix(Hash64.fnv1a("a".getBytes("UTF-8"))))
  }

  test("simhash: identical token sets → identical hash; near sets → small hamming") {
    val base = (1 to 60).map(i => s"tok$i")
    val near = base.updated(5, "changed")
    val far = (1 to 60).map(i => s"other$i")
    val df = Seq(base, near, far).toDF("toks")
    val hs = df.select(HashFunctions.simhash64(col("toks"))).as[Long].collect()
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(1)) < 16, "near-dup should have small hamming")
    assert(ham(hs(0), hs(2)) > 16, "unrelated should have large hamming")
  }

  test("minhash signature estimates jaccard") {
    val a = (1 to 100).map(_.toString)
    val b = (1 to 80).map(_.toString) ++ (201 to 220).map(_.toString) // J = 80/120
    val df = Seq(a, b).toDF("sh")
    val sigs = df.select(HashFunctions.minhashSignature(col("sh"), 256))
      .as[Seq[Long]].collect()
    val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - 80.0 / 120.0) < 0.12, s"estimate $est too far")
  }

  test("cosine: exact on known vectors, zero-guard on degenerate") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 0.0f))).toDF("a", "b")
    val got = df.select(VF.cosine(col("a"), col("b"))).as[Double].collect()
    assert(got(0) === 1.0)
    assert(got(1) === 0.0)
    assert(got(2) === 0.0)
  }

  test("seededPlanes are deterministic and in [-1,1]") {
    val p1 = VF.seededPlanes(4, 8, 42L)
    val p2 = VF.seededPlanes(4, 8, 42L)
    assert(p1 === p2)
    assert(p1.flatten.forall(x => x >= -1.0 && x <= 1.0))
    assert(VF.seededPlanes(4, 8, 43L) !== p1)
  }

  test("steadyLong equals lit in value/type/nullability through codegen, " +
      "filters and writes (r18: the plan-cache-friendly batch-id literal)") {
    import graft.functions.SteadyLit.steadyLong
    import org.apache.spark.sql.functions.{col, lit}
    val df = spark.range(5)
    val a = df.select(col("id"), steadyLong(7L).as("__v"))
    val b = df.select(col("id"), lit(7L).as("__v"))
    assert(a.schema === b.schema) // LongType, non-nullable, same names
    assert(a.collect().map(_.toString).sorted.toSeq ===
      b.collect().map(_.toString).sorted.toSeq)
    // survives a downstream filter referencing the column (non-foldable,
    // so the optimizer must NOT constant-fold it away incorrectly)
    assert(a.filter(col("__v") === 7L).count() === 5)
    assert(a.filter(col("__v") === 8L).count() === 0)
    // parquet round-trip: the written bytes carry the plain long value
    val out = java.nio.file.Files.createTempDirectory("steady_").toString
    a.write.parquet(s"$out/p")
    assert(spark.read.parquet(s"$out/p").filter(col("__v") === 7L)
      .count() === 5)
  }

  test("Versions.read schema cache returns the same rows as a plain read " +
      "and never crosses cache keys (r18)") {
    import graft.streaming.Versions
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("vread_").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(s"$root/k1/v0")
    Seq((9.5, true)).toDF("x", "ok").write.parquet(s"$root/k2/v0")
    // first read infers and caches; second read uses the cached schema
    val r1a = Versions.read(spark, s"$root/k1", Seq(s"$root/k1/v0"))
    val r1b = Versions.read(spark, s"$root/k1", Seq(s"$root/k1/v0"))
    assert(r1a.schema === r1b.schema)
    assert(r1b.orderBy(col("id")).collect().map(_.toString).toSeq ===
      spark.read.parquet(s"$root/k1/v0").orderBy(col("id")).collect()
        .map(_.toString).toSeq)
    // a different key infers its own schema — no cross-key poisoning
    val r2 = Versions.read(spark, s"$root/k2", Seq(s"$root/k2/v0"))
    assert(r2.schema.fieldNames.toSeq === Seq("x", "ok"))
    assert(r2.count() === 1)
  }
}
