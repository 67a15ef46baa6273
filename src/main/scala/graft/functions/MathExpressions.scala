package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** `bit_interleave(a, b)` → Morton (Z-order) code: the low `bits` bits of
  * `a` and `b` interleaved (a on odd positions), as a long.
  *
  * The space-filling-curve kernel of multi-dimensional data clustering
  * ([[graft.sources.Layouts.writeZOrdered]]): rows sorted by z-value land
  * in files whose min/max footer stats bound a hyper-rectangle of the
  * (a, b) plane, so a range predicate on EITHER column skips most files —
  * a 1-D sort can only cluster its own column. Inputs are expected to be
  * rank-space bucket ids in [0, 2^bits); higher bits are masked off.
  */
case class BitInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  // NOTE: assign the casts to locals and split the two |= terms — Janino
  // rejects the fused one-liner ("(((long) v >> k) & 1L) << (2*k+1)" parses
  // as a type), which silently dropped this expression to the interpreted
  // path (ERROR CodeGenerator in logs, fallback, no wrong results).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val k = ctx.freshName("k")
      val av = ctx.freshName("av")
      val bv = ctx.freshName("bv")
      val ab = ctx.freshName("ab")
      val bb = ctx.freshName("bb")
      s"""
        |final long $av = (long) $a;
        |final long $bv = (long) $b;
        |long $z = 0L;
        |for (int $k = 0; $k < $bits; $k++) {
        |  final long $ab = ($av >> $k) & 1L;
        |  final long $bb = ($bv >> $k) & 1L;
        |  $z |= $ab << (2 * $k + 1);
        |  $z |= $bb << (2 * $k);
        |}
        |${ev.value} = $z;
        |""".stripMargin
    })
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Int].toLong
    val b = r.asInstanceOf[Int].toLong
    var z = 0L
    var k = 0
    while (k < bits) {
      z |= (((a >> k) & 1L) << (2 * k + 1)) | (((b >> k) & 1L) << (2 * k))
      k += 1
    }
    z
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitInterleave =
    copy(left = l, right = r)
}

object PortableMath {
  import org.apache.spark.sql.GraftBridge.{toCol, toExpr}
  /** Column surface for [[PortableLn]]. */
  def lnPortable(c: Column): Column =
    toCol(PortableLn(toExpr(c.cast("double"))))
  /** Column surface for [[BitInterleave]] over int bucket ids. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    toCol(BitInterleave(toExpr(a.cast("int")), toExpr(b.cast("int")), bits))
}
