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

  /** See [[Fingerprint64]]. */
  def fingerprint64(s: UTF8String): Long = Hash64.mix(Hash64.fnv1a(s))

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

  /** See [[TokenShinglesExpr]]. */
  def tokenShingles(arr: ArrayData, n: Int): ArrayData = {
    val num = arr.numElements()
    val toks = new Array[String](num)
    var i = 0
    while (i < num) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val out: Array[Any] =
      if (num < n) Array(UTF8String.fromString(toks.mkString(" ")))
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
}
