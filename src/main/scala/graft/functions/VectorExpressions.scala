package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** All LSH table buckets of one vector in a single pass: for table t, bucket
  * bit b is the sign of v·plane(t,b). Output: array<long> of `tables`
  * buckets.
  *
  * Exists for plan economy: the Column-composed form (`tables × bits`
  * separate higher-order `aggregate` expressions) is interpreted per
  * expression and re-reads the vector 96 times per row; this evaluates the
  * whole plane bank in one tight loop over the vector. Planes are passed as
  * literal data (seeded, reproducible — see
  * [[VectorFunctions.seededPlanes]]).
  */
case class HyperplaneBucketsExpr(child: Expression, planes: Array[Array[Double]],
    tables: Int, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(planes.length == tables * bits, "planes must be tables*bits rows")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  @transient private lazy val elementIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Double](n)
    var i = 0
    if (elementIsFloat) while (i < n) { v(i) = arr.getFloat(i); i += 1 }
    else while (i < n) { v(i) = arr.getDouble(i); i += 1 }

    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < bits) {
        val p = planes(t * bits + b)
        val d = math.min(n, p.length)
        var dot = 0.0
        var j = 0
        while (j < d) { dot += v(j) * p(j); j += 1 }
        if (dot >= 0.0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBucketsExpr =
    copy(child = c)
}

object VectorExpressions {
  /** Buckets of `vec` in `tables` LSH tables of `bits` hyperplanes each,
    * derived deterministically from `seed` (table t uses seed + t·7919). */
  def hyperplaneBuckets(vec: Column, tables: Int, bits: Int, dim: Int,
      seed: Long): Column = {
    val planes: Array[Array[Double]] = (0 until tables).flatMap { t =>
      VectorFunctions.seededPlanes(bits, dim, seed + t * 7919L).map(_.toArray)
    }.toArray
    ColumnBridge.column(HyperplaneBucketsExpr(
      ColumnBridge.expression(vec), planes, tables, bits))
  }
}
