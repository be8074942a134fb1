package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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
case class TokenizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize"

  // same engine as functions.lower + functions.split: UTF8String lowercase,
  // java.util.regex split — keeps oracle parity exact (see GraftKernels)
  override def nullSafeEval(input: Any): Any =
    GraftKernels.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftKernels.tokenize($c)")

  override protected def withNewChildInternal(c: Expression): TokenizeExpr =
    copy(child = c)
}

/** Word n-gram shingles, space-joined; arrays shorter than `n` collapse to a
  * single all-tokens shingle (mirrors [[TextFunctions.tokenShingles]]). */
case class TokenShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_shingles"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.tokenShingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftKernels.tokenShingles($c, $n)")

  override protected def withNewChildInternal(c: Expression): TokenShinglesExpr =
    copy(child = c)
}

/** Sliding character k-grams of the raw string (char-level near-dup for
  * unsegmented scripts). Window positions are UTF-16 units. */
case class CharShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def nullSafeEval(input: Any): Any =
    GraftKernels.charShingles(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftKernels.charShingles($c, $k)")

  override protected def withNewChildInternal(c: Expression): CharShinglesExpr =
    copy(child = c)
}

object TextExpressions {
  def tokenize(text: Column): Column =
    ColumnBridge.column(TokenizeExpr(ColumnBridge.expression(text)))

  def charShingles(text: Column, k: Int): Column =
    ColumnBridge.column(CharShinglesExpr(ColumnBridge.expression(text), k))

  def tokenShingles(toks: Column, n: Int): Column =
    ColumnBridge.column(TokenShinglesExpr(ColumnBridge.expression(toks), n))
}
