package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels invoked from generated code (`doGenCode`) — top-level
  * object methods compile to static forwarders, so Janino-generated Java can
  * call `graft.functions.GraftKernels.cosine(a, b)` directly. Each mirrors
  * its expression's interpreted eval exactly. */
object GraftKernels {

  /** See [[CosineSimilarityExpr]]: left-to-right double accumulation,
    * dot/(√‖a‖²·√‖b‖²), 0.0 on zero norms. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val sa = math.sqrt(na); val sb = math.sqrt(nb)
    if (sa == 0.0 || sb == 0.0) 0.0 else dot / (sa * sb)
  }

  /** See [[SeqSqDistExpr]]: squared-L2 as the exact `seqSqDist` rounding
    * sequence — 0.0-seeded left fold, dimensions ascending, each term
    * `(a_i - b_i)·(a_i - b_i)` (subtract, multiply, add: the identical
    * IEEE op chain the Column HOF form and the DuckDB oracle's
    * `list_reduce(list_prepend(0.0, …))` evaluate, so results are
    * bit-identical on well-formed input). Mismatched lengths (malformed
    * data) fold the common prefix, like [[cosine]]. */
  def seqSqDist(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  /** See [[CenteredDotExpr]]: the PCA projection fold — 0.0-seeded left
    * fold, dimensions ascending, each term `(v_i - mu_i)·pc_i` (subtract,
    * multiply, add: the identical IEEE op chain the Column HOF form and
    * the DuckDB oracle's `list_reduce(list_prepend(0.0, …))` evaluate).
    * Callers guarantee `v.length == mu.length == pc.length` (pcaProject
    * admits only model-dimension vectors); shorter model arrays bound the
    * fold defensively. */
  def centeredDot(v: ArrayData, mu: Array[Double], pc: Array[Double],
      isFloat: Boolean): Double = {
    val n = math.min(v.numElements(), math.min(mu.length, pc.length))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      acc += (x - mu(i)) * pc(i)
      i += 1
    }
    acc
  }

  /** See [[Fingerprint64]]. */
  def fingerprint64(s: UTF8String): Long = Hash64.mix(Hash64.fnv1a(s))

  private def toDoubles(arr: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    if (isFloat) while (i < n) { v(i) = arr.getFloat(i); i += 1 }
    else while (i < n) { v(i) = arr.getDouble(i); i += 1 }
    v
  }

  /** See [[HyperplaneBucketsExpr]]. */
  def hyperplaneBuckets(arr: ArrayData, planes: Array[Array[Double]],
      tables: Int, bits: Int, isFloat: Boolean): ArrayData = {
    val v = toDoubles(arr, isFloat)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val p = planes(t * bits + b)
        val d = math.min(v.length, p.length)
        var dot = 0.0
        var j = 0
        while (j < d) { dot += v(j) * p(j); j += 1 }
        if (dot >= 0.0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** See [[NearestCentroidsExpr]]. */
  def nearestCentroids(arr: ArrayData, centroids: Array[Array[Double]],
      nProbe: Int, isFloat: Boolean): ArrayData = {
    val v = toDoubles(arr, isFloat)
    val dists = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val d = math.min(v.length, cent.length)
      var acc = 0.0
      var j = 0
      while (j < d) { val t = v(j) - cent(j); acc += t * t; j += 1 }
      dists(c) = acc
      c += 1
    }
    val idx = Array.range(0, centroids.length)
      .sortBy(i => (dists(i), i)).take(nProbe).map(Int.box)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      idx.asInstanceOf[Array[Any]])
  }

  /** See [[PqCodesExpr]]: per-subspace nearest-code ids (squared L2, ties →
    * lower id) under product-quantization codebooks of shape
    * m × nCodes × subDim. Subspace j quantizes v[j·subDim, (j+1)·subDim). */
  def pqCodes(arr: ArrayData, banks: Array[Array[Array[Double]]],
      isFloat: Boolean): ArrayData = {
    val v = toDoubles(arr, isFloat)
    val m = banks.length
    val out = new Array[Int](m)
    var j = 0
    var off = 0
    while (j < m) {
      val bank = banks(j)
      val subDim = bank(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < bank.length) {
        val cent = bank(c)
        val d = math.min(subDim, math.max(0, v.length - off))
        var acc = 0.0
        var i = 0
        while (i < d) { val t = v(off + i) - cent(i); acc += t * t; i += 1 }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(j) = best
      off += subDim
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** See [[PqDecodeExpr]]: reconstruct the quantized vector — concatenate
    * each subspace's selected codeword. */
  def pqDecode(codes: ArrayData, banks: Array[Array[Array[Double]]]): ArrayData = {
    val m = banks.length
    var dim = 0
    var j = 0
    while (j < m) { dim += banks(j)(0).length; j += 1 }
    val out = new Array[Double](dim)
    var off = 0
    j = 0
    while (j < m) {
      val cent = banks(j)(codes.getInt(j))
      System.arraycopy(cent, 0, out, off, cent.length)
      off += cent.length
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** See [[TokenizeExpr]]. */
  def tokenize(s: UTF8String): ArrayData = {
    val parts = s.toLowerCase.toString.split("[^a-z0-9]+")
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) out += UTF8String.fromString(parts(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

  /** See [[TokenShinglesExpr]]. Null elements are skipped (same contract as
    * [[simhash64]]/[[minhash]]) — the SQL-registered `token_shingles` accepts
    * arbitrary `array<string>` input.
    *
    * Short-doc contract (deliberate): fewer than `n` usable tokens — which
    * includes empty and all-null arrays — yields ONE shingle, the
    * space-join of whatever tokens exist ([""] when none). Empty docs are
    * therefore all mutually identical to dedup, which is the curation
    * semantic we want, and every oracle encodes the same fallback
    * (`CASE WHEN len(toks) < n THEN [array_to_string(toks, ' ')] …`). */
  def tokenShingles(arr: ArrayData, n: Int): ArrayData = {
    val total = arr.numElements()
    val toks = new Array[String](total)
    var num = 0
    var i = 0
    while (i < total) {
      if (!arr.isNullAt(i)) { toks(num) = arr.getUTF8String(i).toString; num += 1 }
      i += 1
    }
    val out: Array[Any] =
      if (num < n) Array(UTF8String.fromString(toks.take(num).mkString(" ")))
      else {
        val res = new Array[Any](num - n + 1)
        var st = 0
        while (st <= num - n) {
          val sb = new java.lang.StringBuilder()
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(st + j))
            j += 1
          }
          res(st) = UTF8String.fromString(sb.toString)
          st += 1
        }
        res
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** See [[TokenSimHash64]]. */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Hash64.mix(Hash64.fnv1a(arr.getUTF8String(i)))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** See [[CharShinglesExpr]]: sliding k-char windows (UTF-16 units);
    * strings of length <= k collapse to one shingle. */
  def charShingles(s: UTF8String, k: Int): ArrayData = {
    val str = s.toString
    val out: Array[Any] =
      if (str.length <= k) Array(UTF8String.fromString(str))
      else {
        val res = new Array[Any](str.length - k + 1)
        var i = 0
        while (i <= str.length - k) {
          res(i) = UTF8String.fromString(str.substring(i, i + k))
          i += 1
        }
        res
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** See [[MinHashSignature]]. */
  def minhash(arr: ArrayData, coefA: Array[Long], coefB: Array[Long]): ArrayData = {
    val numHashes = coefA.length
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Hash64.fnv1a(arr.getUTF8String(i))
        var j = 0
        while (j < numHashes) {
          val g = coefA(j) * h + coefB(j)
          if (g < sig(j)) sig(j) = g
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  /** HLL rank: 1 + the number of leading zero bits of `w` within a
    * (64−p)-bit window, where `w = hash >>> p` (so `w < 2^(64−p)`).
    * `w == 0` → the whole window is zeros → 64 − p + 1. Pure integer —
    * the DuckDB oracle re-derives it as `64 − p − length(bin(w)) + 1`. */
  def hllRho(hash: Long, p: Int): Int = {
    val w = hash >>> p
    if (w == 0L) 64 - p + 1
    else java.lang.Long.numberOfLeadingZeros(w) - p + 1
  }
}
