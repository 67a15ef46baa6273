package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `portable_ln(x)` → natural log via `java.lang.Math.log`.
  *
  * Spark's built-in `log` evaluates `java.lang.StrictMath.log` (fdlibm),
  * which differs from the platform libm in the last ULP on ~7% of inputs
  * (measured 369/5000 over the tf-idf N/df domain). DuckDB — the
  * correctness oracle — uses the platform libm, which `Math.log`
  * intrinsifies to, so scores built on this expression hash-match the
  * oracle bit-for-bit while staying inside whole-stage codegen.
  * Null-safe: null in → null out (UnaryExpression default).
  */
case class PortableLn(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"portable_ln needs DOUBLE input, got ${child.dataType}")
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"java.lang.Math.log($v)")
  override def nullSafeEval(input: Any): Any =
    java.lang.Math.log(input.asInstanceOf[Double])
  override protected def withNewChildInternal(c: Expression): PortableLn =
    copy(child = c)
}

object PortableMath {
  import org.apache.spark.sql.GraftBridge.{toCol, toExpr}
  /** Column surface for [[PortableLn]]. */
  def lnPortable(c: Column): Column =
    toCol(PortableLn(toExpr(c.cast("double"))))
}
