package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenize/shingle expressions. Semantically identical to the
  * Column-composed forms in [[TextFunctions]] (and to the DuckDB oracle
  * contract: lowercase → split `[^a-z0-9]+` → drop empties), but evaluated
  * in one pass per row. The composed forms go through interpreted
  * higher-order functions (`transform`/`slice`/`array_join` have no codegen),
  * which profiled ~10× slower on shingling — these expressions are the hot
  * path for MinHash/SimHash dedup over a large corpus.
  */
case class TokenizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  override def nullSafeEval(input: Any): Any = {
    // same engine as functions.lower + functions.split: UTF8String lowercase,
    // java.util.regex split — keeps oracle parity exact
    val parts = input.asInstanceOf[UTF8String].toLowerCase.toString
      .split("[^a-z0-9]+")
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](parts.length)
    var i = 0
    while (i < parts.length) {
      if (parts(i).nonEmpty) out += UTF8String.fromString(parts(i))
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(c: Expression): TokenizeExpr =
    copy(child = c)
}

/** Word n-gram shingles, space-joined; arrays shorter than `n` collapse to a
  * single all-tokens shingle (mirrors [[TextFunctions.tokenShingles]]). */
case class TokenShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_shingles"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val num = arr.numElements()
    val toks = new Array[String](num)
    var i = 0
    while (i < num) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    val out: Array[Any] =
      if (num < n) Array(UTF8String.fromString(toks.mkString(" ")))
      else {
        val res = new Array[Any](num - n + 1)
        var s = 0
        while (s <= num - n) {
          val sb = new java.lang.StringBuilder()
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(s + j))
            j += 1
          }
          res(s) = UTF8String.fromString(sb.toString)
          s += 1
        }
        res
      }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): TokenShinglesExpr =
    copy(child = c)
}

object TextExpressions {
  def tokenize(text: Column): Column =
    ColumnBridge.column(TokenizeExpr(ColumnBridge.expression(text)))

  def tokenShingles(toks: Column, n: Int): Column =
    ColumnBridge.column(TokenShinglesExpr(ColumnBridge.expression(toks), n))
}
