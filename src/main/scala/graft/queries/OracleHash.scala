package graft.queries

import graft.functions.Hash64

/** DuckDB SQL fragment builders that replay graft's 64-bit hash kernels —
  * [[graft.functions.Hash64.fnv1a]], [[graft.functions.Hash64.mix]], and the
  * derived simhash/minhash signatures — in exact HUGEINT arithmetic, so the
  * custom-hash operators (p08/p09/p12) are hash-match oracle-checked instead
  * of rows-only.
  *
  * Everything is unsigned mod-2^64 arithmetic staged in HUGEINT (128-bit):
  * the only care points are (a) 64×64-bit products, which can reach 2^128
  * and must be split into 32-bit halves ([[lo64MulConst]]/[[lo64Mul]]), and
  * (b) Spark's `Long` being two's-complement — [[signed64]] converts the
  * unsigned residue to the signed BIGINT Spark reports, and minhash's
  * slot MIN compares in that signed domain (`GraftKernels.minhash` inits
  * slots at `Long.MaxValue` and uses signed `<`).
  *
  * DuckDB `split(s, '')` yields code points while FNV-1a consumes UTF-8
  * bytes, so [[utf8Bytes]] re-encodes each code point arithmetically.
  */
private[queries] object OracleHash {
  /** 2^64 as a HUGEINT literal. */
  val P64 = "18446744073709551616::HUGEINT"
  /** 2^63 as a HUGEINT literal. */
  val S63 = "9223372036854775808::HUGEINT"

  /** UTF-8 byte list (INT) of string expr `e`. Empty string → []. */
  def utf8Bytes(e: String): String =
    s"flatten(list_transform(list_filter(split($e, ''), c -> c != ''), c -> CASE" +
      " WHEN unicode(c) < 128 THEN [unicode(c)]" +
      " WHEN unicode(c) < 2048 THEN [192 + unicode(c) // 64, 128 + unicode(c) % 64]" +
      " WHEN unicode(c) < 65536 THEN [224 + unicode(c) // 4096, 128 + (unicode(c) // 64) % 64, 128 + unicode(c) % 64]" +
      " ELSE [240 + unicode(c) // 262144, 128 + (unicode(c) // 4096) % 64, 128 + (unicode(c) // 64) % 64, 128 + unicode(c) % 64] END))"

  /** FNV-1a over the UTF-8 bytes of string expr `e`, as unsigned HUGEINT.
    * The offset basis is prepended so `list_reduce` starts from it (FNV of
    * "" is the bare offset, same as the kernel). */
  def fnv1a(e: String): String =
    s"list_reduce(list_prepend(${java.lang.Long.toUnsignedString(Hash64.FnvOffset)}::HUGEINT, ${utf8Bytes(e)})," +
      s" (h, b) -> (xor(h, b::HUGEINT) * ${Hash64.FnvPrime}::HUGEINT) % $P64)"

  /** lo64(a * c) for a variable unsigned HUGEINT expr `a` (< 2^64) and a
    * compile-time 64-bit constant `c`, split so no intermediate exceeds
    * HUGEINT range. `a` is referenced three times — pass a column ref or a
    * cheap expression. */
  def lo64MulConst(a: String, c: Long): String = {
    val cu = BigInt(java.lang.Long.toUnsignedString(c))
    val chi = cu >> 32
    val clo = cu & 0xffffffffL
    s"((($a) % 4294967296::HUGEINT) * $clo::HUGEINT +" +
      s" (((($a) % 4294967296::HUGEINT) * $chi::HUGEINT +" +
      s" (($a) // 4294967296::HUGEINT) * $clo::HUGEINT) % 4294967296::HUGEINT)" +
      s" * 4294967296::HUGEINT) % $P64"
  }

  /** lo64(a * b) for two variable unsigned HUGEINT exprs (< 2^64). Both are
    * referenced three times — pass column refs. */
  def lo64Mul(a: String, b: String): String =
    s"((($a) % 4294967296::HUGEINT) * (($b) % 4294967296::HUGEINT) +" +
      s" (((($a) % 4294967296::HUGEINT) * (($b) // 4294967296::HUGEINT) +" +
      s" (($a) // 4294967296::HUGEINT) * (($b) % 4294967296::HUGEINT)) % 4294967296::HUGEINT)" +
      s" * 4294967296::HUGEINT) % $P64"

  /** SplitMix64 finalizer over unsigned HUGEINT expr `z` (< 2^64) — exact
    * mirror of [[Hash64.mix]]. The expansion nests `z` ~27× (each xor/shift
    * stage re-references its input), so `z` MUST be a column ref: stage the
    * FNV fold into a CTE column first, then mix in the next CTE. */
  def mix(z: String): String = {
    val s1 = s"(($z) + ${java.lang.Long.toUnsignedString(0x9e3779b97f4a7c15L)}::HUGEINT) % $P64"
    val x1 = s"xor(($s1), ($s1) >> 30)"
    val s2 = lo64MulConst(x1, 0xbf58476d1ce4e5b9L)
    val x2 = s"xor(($s2), ($s2) >> 27)"
    val s3 = lo64MulConst(x2, 0x94d049bb133111ebL)
    s"xor(($s3), ($s3) >> 31)"
  }

  /** Two's-complement view of unsigned HUGEINT expr `u`: the signed BIGINT
    * Spark's `Long` columns report. `u` is referenced twice. */
  def signed64(u: String): String =
    s"(CASE WHEN ($u) >= $S63 THEN ($u) - $P64 ELSE ($u) END)::BIGINT"

  /** The minhash permutation coefficient bank as SQL VALUES rows
    * `(j, a, b)` — the same seed-derived constants `MinHashSignature`
    * generates (`a = mix(seed + 2j) | 1`, `b = mix(seed + 2j + 1)`),
    * embedded as literals (they are model parameters, like the stopword
    * list in the quality oracle; the per-shingle hashing and the a·h+b
    * permutations are replayed in SQL arithmetic). */
  def minhashCoefValues(numHashes: Int, seed: Long): String =
    (0 until numHashes).map { j =>
      val a = java.lang.Long.toUnsignedString(Hash64.mix(seed + 2L * j) | 1L)
      val b = java.lang.Long.toUnsignedString(Hash64.mix(seed + 2L * j + 1L))
      s"($j, $a::HUGEINT, $b::HUGEINT)"
    }.mkString(", ")

  // ------------------------------------------------------------------
  // Vector-replay fragments: the LSH hyperplane machinery is pure
  // integer→IEEE-double arithmetic (seeded planes) plus sequential
  // double folds (the kernel accumulates dot products in index order),
  // so DuckDB replays buckets bit-exactly — float inputs widen to
  // double exactly on both engines, and strict left-to-right
  // `list_reduce` reproduces the kernel's rounding sequence.
  // ------------------------------------------------------------------

  /** Sequential-order dot product of two DOUBLE[] exprs — the exact
    * rounding sequence of `GraftKernels.hyperplaneBuckets`/`cosine`
    * (same fold the established cosine oracle uses). */
  def seqDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])), (x, y) -> x + y)"

  /** Sequential-order squared-L2 distance of two DOUBLE[] exprs — the
    * rounding sequence of `GraftKernels.nearestCentroids`' fold. */
  def seqSqDist(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), (x, y) -> x + y)"

  // ------------------------------------------------------------------
  // K-means replay fragments: the IVF/PQ "trained" banks are bit-
  // deterministic (decimal-staged Lloyd iterations), so training is a
  // deterministic relational expression DuckDB can replay from raw data.
  // Two Java/DuckDB conversion gaps must be bridged through VARCHAR:
  // Spark casts double→DECIMAL via Double.toString (shortest digits),
  // and BigDecimal.doubleValue() rounds the decimal ONCE — DuckDB's
  // binary casts do exact-value and double-rounding conversions
  // respectively, each off by 1 ulp on ~15% of values.
  // ------------------------------------------------------------------

  /** Spark's `cast(double as DECIMAL(38,18))`: via the shortest decimal
    * string, not the exact binary expansion. */
  def decimalStage(x: String): String =
    s"CAST(CAST($x AS VARCHAR) AS DECIMAL(38,18))"

  /** Java's `BigDecimal.doubleValue()`: one correctly-rounded conversion
    * (DECIMAL→VARCHAR is exact digits; VARCHAR→DOUBLE parses correctly
    * rounded — never the double-rounding of a binary DECIMAL→DOUBLE). */
  def decimalToDouble(s: String): String =
    s"CAST(CAST($s AS VARCHAR) AS DOUBLE)"

  /** The stride-sample seed (`ivfCentroids`/`pqTrain`): of the first
    * `n`·`stride` rows of `emb(id, v)` by id, every `stride`-th vector, as
    * CTE `$name(${keyCol} INT, v)`. */
  def strideSampleCte(name: String, n: Int, keyCol: String,
      stride: Int = 50, src: String = "emb"): String =
    s"""$name AS (
       |  SELECT CAST((rn - 1) // $stride AS INT) AS $keyCol, v
       |  FROM (SELECT id, v, ROW_NUMBER() OVER (ORDER BY id) AS rn
       |        FROM (SELECT id, v FROM $src ORDER BY id LIMIT ${n * stride}))
       |  WHERE (rn - 1) % $stride = 0 AND (rn - 1) // $stride < $n)""".stripMargin

  /** Nearest-cell assignment of `source` rows (default the `emb` CTE)
    * under centroid CTE `bank(cell, cv)` — argmin of the sequential
    * squared-L2 fold, ties to the lower cell (the `nearestCentroids`
    * kernel's contract). Emits CTE `$name(id, v, cell)` for rank 1, or
    * (id, cell) ranks ≤ `keep`. */
  def nearestCellCte(name: String, bank: String, keep: Int,
      filter: String = "", source: String = "emb"): String = {
    val sel = if (keep == 1) "id, v, cell" else "id, cell"
    s"""$name AS (
       |  SELECT $sel FROM (
       |    SELECT e.id, e.v, c.cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.id
       |        ORDER BY ${seqSqDist("e.v", "c.cv")} ASC, c.cell ASC) AS rn
       |    FROM $source e CROSS JOIN $bank c$filter)
       |  WHERE rn <= $keep)""".stripMargin
  }

  /** The full trained-IVF centroid bank (`ivfCentroidsTrained`): stride
    * seed + `iters` decimal-staged Lloyd iterations, as a CTE chain over
    * `emb(id, v)`. Returns (ctes, finalBankName); bank CTEs are
    * `ivc0..ivc$iters(cell, cv)`. */
  def ivfBankCtes(nCells: Int, iters: Int, stride: Int = 50): (String, String) = {
    val seed = strideSampleCte("ivseed", nCells, "cell", stride) +
      ",\nivc0 AS (SELECT cell, v AS cv FROM ivseed)"
    val rounds = (1 to iters).map { it =>
      val prev = s"ivc${it - 1}"
      s"""${nearestCellCte(s"iva$it", prev, 1)},
         |ivm$it AS (
         |  SELECT cell, p - 1 AS pos,
         |    SUM(${decimalStage("v[p]")}) AS s, COUNT(*) AS n
         |  FROM iva$it CROSS JOIN unnest(range(1, len(v) + 1)) AS r(p)
         |  GROUP BY cell, p),
         |ivc$it AS (
         |  SELECT c.cell, COALESCE(nl.cv, c.cv) AS cv
         |  FROM $prev c LEFT JOIN (
         |    SELECT cell, list(${decimalToDouble("s")} / n ORDER BY pos) AS cv
         |    FROM ivm$it GROUP BY cell) nl ON c.cell = nl.cell)""".stripMargin
    }.mkString(",\n")
    (s"$seed,\n$rounds", s"ivc$iters")
  }

  /** Per-subspace nearest-code assignment under codebook CTE
    * `bank(j, code, cv)` (the `pqCodes` kernel: squared-L2 on the
    * subspace slice, ties to the lower code). Emits
    * `$name(id, j, code)`. */
  def pqAssignCte(name: String, bank: String, subDim: Int,
      src: String = "emb"): String =
    s"""$name AS (
       |  SELECT id, j, code FROM (
       |    SELECT e.id, b.j, b.code,
       |      ROW_NUMBER() OVER (PARTITION BY e.id, b.j
       |        ORDER BY ${seqSqDist(s"e.v[b.j*$subDim+1:(b.j+1)*$subDim]", "b.cv")} ASC, b.code ASC) AS rn
       |    FROM $src e CROSS JOIN $bank b)
       |  WHERE rn = 1)""".stripMargin

  /** The full trained-PQ codebooks (`pqTrain`): per-subspace stride seed
    * + `iters` decimal-staged Lloyd iterations. Returns (ctes,
    * finalBankName); bank CTEs are `${prefix}pqb0..$iters(j, code, cv)`.
    * `prefix`/`src` let one query replay TWO codebook generations (the
    * p129 rebuild lifecycle) without CTE-name or training-source
    * collisions; the defaults are byte-identical to the original
    * fragment (p29/p32/p87/p104 hashes unchanged). */
  def pqBankCtes(m: Int, nCodes: Int, subDim: Int, iters: Int,
      prefix: String = "", src: String = "emb"): (String, String) = {
    val seed = strideSampleCte(s"${prefix}pqseed", nCodes, "code",
      src = src) +
      s""",
         |${prefix}pqb0 AS (
         |  SELECT j.j, ${prefix}pqseed.code, ${prefix}pqseed.v[j.j*$subDim+1:(j.j+1)*$subDim] AS cv
         |  FROM ${prefix}pqseed CROSS JOIN (SELECT CAST(unnest(range($m)) AS INT) AS j) j)""".stripMargin
    val rounds = (1 to iters).map { it =>
      val prev = s"${prefix}pqb${it - 1}"
      s"""${pqAssignCte(s"${prefix}pqa$it", prev, subDim, src = src)},
         |${prefix}pqm$it AS (
         |  SELECT c.j, c.code, CAST((p - 1) % $subDim AS INT) AS pos_in,
         |    SUM(${decimalStage("v[p]")}) AS s, COUNT(*) AS n
         |  FROM $src e CROSS JOIN unnest(range(1, len(e.v) + 1)) AS r(p)
         |  JOIN ${prefix}pqa$it c ON c.id = e.id AND c.j = CAST((p - 1) // $subDim AS INT)
         |  GROUP BY c.j, c.code, pos_in),
         |${prefix}pqb$it AS (
         |  SELECT b.j, b.code, COALESCE(nl.cv, b.cv) AS cv
         |  FROM $prev b LEFT JOIN (
         |    SELECT j, code, list(${decimalToDouble("s")} / n ORDER BY pos_in) AS cv
         |    FROM ${prefix}pqm$it GROUP BY j, code) nl ON b.j = nl.j AND b.code = nl.code)""".stripMargin
    }.mkString(",\n")
    (s"$seed,\n$rounds", s"${prefix}pqb$iters")
  }

  /** The seeded hyperplane bank as SQL VALUES rows `(t, b, p DOUBLE[])` —
    * the same constants `VectorFunctions.seededPlanes` derives (table t
    * uses seed + t·7919), embedded as literals. `Double.toString` is
    * round-trip exact and DuckDB's parser is correctly rounded, so the
    * embedded plane values are bit-identical to the kernel's. */
  def planesValues(tables: Int, bits: Int, dim: Int, seed: Long): String =
    (0 until tables).flatMap { t =>
      val ps = graft.functions.VectorFunctions.seededPlanes(bits, dim, seed + t * 7919L)
      (0 until bits).map { b =>
        s"($t, $b, [${ps(b).mkString(", ")}]::DOUBLE[])"
      }
    }.mkString(",\n")

  /** Multi-probe XOR masks (identity + all Hamming-≤radius flips) as a SQL
    * list body — mirrors the flip enumeration in `Similarity.lshTopK` /
    * `embeddingNearDupPairs`. */
  def probeMasks(bits: Int, radius: Int): String = {
    require(radius >= 0 && radius <= 2)
    val flips1 = if (radius >= 1) (0 until bits).map(i => 1L << i) else Seq.empty
    val flips2 = if (radius >= 2)
      for { i <- 0 until bits; j <- (i + 1) until bits } yield (1L << i) | (1L << j)
    else Seq.empty
    (0L +: (flips1 ++ flips2)).mkString(", ")
  }

  /** Shared CTE chain: per-vector LSH buckets from a base CTE
    * `emb(id, v DOUBLE[])` and a `planes(t, b, p)` CTE — one row per
    * (id, table) with the bucket's bit built from sign(seqDot). */
  def lshBucketCte(name: String): String =
    s"""$name AS (
       |  SELECT id, t, CAST(SUM(CASE WHEN ${seqDot("v", "p")} >= 0.0
       |                        THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM emb CROSS JOIN planes GROUP BY id, t)""".stripMargin

  // ------------------------------------------------------------------
  // Linear-algebra replay fragments: the trained-scorer solves
  // (Scorer.choleskySolve, the IRLS steps) are fixed-order double
  // recurrences over sqrt/mul/sub/div — every op correctly rounded
  // under IEEE 754 on both engines — so the unrolled solve replays
  // bit-exactly as a chained-CTE expression tree.
  // ------------------------------------------------------------------

  /** One column per CTE, each referencing its predecessors — the linear
    * chain shape the solve fragments need (every CTE is consumed exactly
    * once, so DuckDB's inlining stays linear). Returns (ctes,
    * finalName). */
  def chainedCtes(cols: Seq[(String, String)], from: String,
      prefix: String): (String, String) = {
    val ctes = cols.zipWithIndex.map { case ((name, expr), idx) =>
      val src = if (idx == 0) from else s"$prefix${idx - 1}"
      s"$prefix$idx AS (SELECT *, $expr AS $name FROM $src)"
    }.mkString(",\n")
    (ctes, s"$prefix${cols.size - 1}")
  }

  /** Ascending-k subtraction chain `((init - t0) - t1) - …` — the exact
    * association of the Scala solve's `var a = init; for k: a -= t(k)`
    * loops. */
  private def subChain(init: String, terms: Seq[String]): String =
    terms.foldLeft(init)((a, t) => s"($a - $t)")

  /** Unrolled Cholesky solve of M w = b, mirroring
    * [[graft.operators.Scorer.choleskySolve]] index loop for index loop
    * (change only together): columns `${p}l_i_j`, `${p}y_i`, `${p}w_i`
    * chained over the 1-row CTE `from`, whose columns `mCol(i, j)`
    * (i <= j; the solve symmetrizes) and `bCol(i)` hold the staged
    * moments. Returns (ctes, finalName) — read the weights as
    * `${p}w_0 … ${p}w_{d-1}` off the final CTE. */
  def choleskySolveSql(d: Int, from: String, mCol: (Int, Int) => String,
      bCol: Int => String, p: String): (String, String) = {
    def m(i: Int, j: Int): String = mCol(math.min(i, j), math.max(i, j))
    val cols = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (j <- 0 until d) {
      cols += (s"${p}l_${j}_$j" -> s"sqrt(${subChain(m(j, j),
        (0 until j).map(k => s"${p}l_${j}_$k * ${p}l_${j}_$k"))})")
      for (i <- j + 1 until d)
        cols += (s"${p}l_${i}_$j" -> (s"${subChain(m(i, j),
          (0 until j).map(k => s"${p}l_${i}_$k * ${p}l_${j}_$k"))} " +
          s"/ ${p}l_${j}_$j"))
    }
    for (i <- 0 until d)
      cols += (s"${p}y_$i" -> s"${subChain(bCol(i),
        (0 until i).map(k => s"${p}l_${i}_$k * ${p}y_$k"))} / ${p}l_${i}_$i")
    for (i <- d - 1 to 0 by -1)
      cols += (s"${p}w_$i" -> (s"${subChain(s"${p}y_$i",
        (i + 1 until d).map(k => s"${p}l_${k}_$i * ${p}w_$k"))} " +
        s"/ ${p}l_${i}_$i"))
    chainedCtes(cols.toSeq, from, p)
  }

  /** [[graft.operators.Scorer.detExp]]'s mirror as chained columns over
    * an input column ref `x` (pass a COLUMN REF — the clamp references it
    * twice): emits `${p}tc/k/r/pe/ex`, where `${p}ex` is the kernel's
    * result. Constants and Taylor coefficients are read from the Scala
    * kernel itself (`Double.toString` round-trip), so the two sides
    * cannot drift. Spark's `floor` returns LONG while DuckDB's returns
    * DOUBLE — both are exact integrals in [-44, 44], so every downstream
    * use (multiply, compare, shift cast) agrees. */
  def detExpCols(x: String, p: String): Seq[(String, String)] = {
    import graft.operators.Scorer
    // force the string-parse path: a bare 17-digit literal is a DuckDB
    // DECIMAL whose int64-scaled double conversion can land 1 ulp off;
    // CAST(VARCHAR AS DOUBLE) is correctly rounded (the established
    // decimal-bridge rule)
    def dl(d: Double): String =
      s"CAST('${java.lang.Double.toString(d)}' AS DOUBLE)"
    val horner = Scorer.ExpCoef.init.reverse
      .foldLeft(dl(Scorer.ExpCoef.last))(
        (acc, c) => s"($acc * ${p}r + ${dl(c)})")
    Seq(
      s"${p}tc" -> s"greatest(least($x, 30.0), -30.0)",
      s"${p}k" -> s"floor(${p}tc * ${dl(Scorer.InvLn2)} + 0.5)",
      s"${p}r" -> (s"((${p}tc - ${p}k * ${dl(Scorer.Ln2Hi)}) " +
        s"- ${p}k * ${dl(Scorer.Ln2Lo)})"),
      s"${p}pe" -> horner,
      (s"${p}ex" -> (s"(CASE WHEN ${p}k >= 0 THEN " +
        s"CAST((1::BIGINT << CAST(${p}k AS INT)) AS DOUBLE) " +
        s"ELSE 1.0 / CAST((1::BIGINT << CAST(-${p}k AS INT)) AS DOUBLE) " +
        s"END) * ${p}pe")))
  }

  /** Shared CTE chain computing per-doc simhash (unsigned `u` HUGEINT +
    * signed `s` BIGINT) from a base CTE `t(doc_id, toks)` — used by both
    * p09 (pairs) and p12 (per-doc hashes). Produces CTE `sim$tag(id, u, s)`
    * covering EVERY doc (empty-token docs get simhash 0, the kernel's
    * no-vote output). Embed inside a WITH list after `t`. */
  def simhashCtes(tag: String): String =
    s"""tok$tag AS (SELECT doc_id, unnest(toks) AS tk FROM t),
       |th0$tag AS (SELECT doc_id, ${fnv1a("tk")} AS h FROM tok$tag),
       |th$tag AS (SELECT doc_id, ${mix("h")} AS mh FROM th0$tag),
       |votes$tag AS (
       |  SELECT doc_id, b, SUM(CASE WHEN (mh >> b) % 2 = 1 THEN 1 ELSE -1 END) AS v
       |  FROM th$tag CROSS JOIN (SELECT unnest(range(64)) AS b) bits$tag
       |  GROUP BY doc_id, b),
       |sim0$tag AS (
       |  SELECT doc_id, SUM(CASE WHEN v > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END) AS u
       |  FROM votes$tag GROUP BY doc_id),
       |sim$tag AS (
       |  SELECT t.doc_id AS id, COALESCE(u, 0::HUGEINT) AS u,
       |         ${signed64("COALESCE(u, 0::HUGEINT)")} AS s
       |  FROM t LEFT JOIN sim0$tag ON t.doc_id = sim0$tag.doc_id)""".stripMargin
}
