package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** A long constant that travels into generated code as a REFERENCE OBJECT
  * instead of inlined source text — the plan-cache-friendly batch-id
  * literal (r18, VERDICT r17 next #1).
  *
  * Why not `lit(v)`: `Literal.doGenCode` pastes the value into the
  * generated Java source, so every micro-batch trigger's `lit(batchId)`
  * produces a DIFFERENT source string for otherwise identical stages —
  * a guaranteed Janino cache miss, i.e. a full compile (~10-40 ms) per
  * codegen stage per trigger, hundreds of times per lifecycle query. The
  * per-trigger constants here ride the generated class's `references`
  * array (exactly how [[MinHashSignature]]'s coefficient banks travel),
  * so the source string — and the compiled class — is IDENTICAL across
  * triggers and the cache hits.
  *
  * `foldable = false` is load-bearing: constant folding would collapse
  * the expression right back into an inline `Literal`. The cost is that
  * downstream constant-level optimizations don't see through it — use it
  * only for write-side provenance columns (`__v`, `batch`), never for
  * filter predicates that should fold or push down.
  */
case class SteadyLong(value: Long) extends LeafExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "steady_long"
  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("steadyLong",
      java.lang.Long.valueOf(value), "java.lang.Long")
    ev.copy(
      code = code"final long ${ev.value} = $ref.longValue();",
      isNull = FalseLiteral)
  }
}

object SteadyLit {
  /** `lit(v)` with a codegen-stable source rendering (see [[SteadyLong]]). */
  def steadyLong(v: Long): Column = ColumnBridge.column(SteadyLong(v))
}
