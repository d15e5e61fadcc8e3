package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.{shim => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expressions for the similarity-search hot path.
  *
  * The built-in route (`aggregate(zip_with(a, b, _*_), 0, _+_)`) evaluates
  * its lambda once per element through interpreted HigherOrderFunction
  * machinery — fine for ETL, too slow for an O(N*M*dim) ANN kernel. These
  * expressions generate a tight primitive loop inside whole-stage codegen
  * (`doGenCode`), keeping the entire scorer in one JIT-compiled stage.
  *
  * Semantics identical to the HOF route (exact int64 math over quantized
  * vectors) — asserted by VectorExprSpec — so oracle parity is unaffected.
  */
object VectorExpressions {

  /** Exact integer dot product over two ARRAY<BIGINT> columns. */
  def dot_q(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductLong(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Exact integer squared norm of an ARRAY<BIGINT> column. */
  def norm_sq_q(a: Column): Column =
    ExpressionUtils.column(NormSqLong(ExpressionUtils.expression(a)))
}

case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers guarantee ARRAY<BIGINT> inputs (quantized vectors)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_q"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getLong($i) * $b.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class NormSqLong(child: Expression)
    extends UnaryExpression {

  // caller guarantees an ARRAY<BIGINT> input (quantized vector)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "norm_sq_q"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getLong(i); acc += v * v; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $v = $a.getLong($i);
         |  ${ev.value} += $v * $v;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
