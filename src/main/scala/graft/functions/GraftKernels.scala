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
}
