package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge.{toCol, toExpr}

/** Product-quantization encode (Jégou et al., TPAMI 2011, "Product
  * Quantization for Nearest Neighbor Search"): the vector is split into
  * M contiguous subvectors; each is replaced by the index of its nearest
  * (L2) sub-centroid from a per-subspace codebook of K entries. A
  * 64-float embedding (256 bytes) becomes M=8 small ints — the corpus
  * representation ANN scans at 100 TB scale, where reading raw vectors is
  * the bottleneck. Codebooks are constructor constants (driver-trained,
  * serialized with the expression), so encoding is pure scan-stage
  * compute: no shuffle, no join, no window.
  *
  * Ties break toward the lower centroid index; a short input vector is
  * zero-padded by construction of the loop bound (missing dims contribute
  * centroid² to the distance). Output: array<int> of length M.
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {
  private lazy val cb: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", cb, "float[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.freshName("m")
      val kk = ctx.freshName("kk")
      val d = ctx.freshName("d")
      val sub = ctx.freshName("sub")
      val out = ctx.freshName("out")
      val best = ctx.freshName("best")
      val bd = ctx.freshName("bd")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      val cvec = ctx.freshName("cvec")
      val off = ctx.freshName("off")
      val nm = cb.length
      s"""
        |final int[] $out = new int[$nm];
        |for (int $m = 0; $m < $nm; $m++) {
        |  final float[][] $sub = $cbRef[$m];
        |  final int $off = $m * $sub[0].length;
        |  int $best = 0; double $bd = Double.POSITIVE_INFINITY;
        |  for (int $kk = 0; $kk < $sub.length; $kk++) {
        |    final float[] $cvec = $sub[$kk];
        |    double $dist = 0.0;
        |    for (int $d = 0; $d < $cvec.length; $d++) {
        |      final double $diff = ($off + $d < $v.numElements()
        |        ? (double) $v.getFloat($off + $d) : 0.0) - (double) $cvec[$d];
        |      $dist += $diff * $diff;
        |    }
        |    if ($dist < $bd) { $bd = $dist; $best = $kk; }
        |  }
        |  $out[$m] = $best;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |""".stripMargin
    })
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](cb.length)
    var m = 0
    while (m < cb.length) {
      val sub = cb(m)
      val off = m * sub(0).length
      var best = 0; var bd = Double.PositiveInfinity
      var k = 0
      while (k < sub.length) {
        val cvec = sub(k)
        var dist = 0.0
        var d = 0
        while (d < cvec.length) {
          val x = if (off + d < v.numElements()) v.getFloat(off + d).toDouble else 0.0
          val diff = x - cvec(d)
          dist += diff * diff
          d += 1
        }
        if (dist < bd) { bd = dist; best = k }
        k += 1
      }
      out(m) = best
      m += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

object Pq {
  def pqEncode(c: Column, codebooks: Seq[Seq[Seq[Float]]]): Column =
    toCol(PqEncode(toExpr(c), codebooks))
}
