package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge.{toCol, toExpr}

/** In-bucket LSH pair expansion as tight primitive loops.
  *
  * The SQL formulation (`flatten(transform(xs, (x,i) -> transform(slice(
  * xs,...), y -> struct(...))))`) walks the higher-order-function
  * machinery once per candidate pair — 12M+ evaluator frames for a corpus
  * of a few thousand docs — and that overhead, not the arithmetic,
  * dominated the LSH queries' wall time (measured ~7 s of an 8 s query at
  * sf0.1). These expressions emit each pair as one (a, b) struct row from
  * a plain nested loop; the downstream `distinct` dedups fixed-width
  * 16-byte UnsafeRows.
  *
  * History: until round 9 the pairs were packed into single longs
  * (`(a << 32) | b`), which dedups 8-byte values but REQUIRES ids in
  * [0, 2^32) — the 1000× probe corpus (doc_ids to ~10^10, exactly the id
  * regime of a 100 TB deployment) hit the guard. The struct emission has
  * no id-width ceiling; the measured cost delta vs packed longs at the
  * same scale is within noise (the loop and the explode dominate either
  * way, see BENCH_SCALING round 9).
  *
  * Both expressions carry `doGenCode`: the loop itself is plain JVM code
  * either way, but a CodegenFallback expression splits the enclosing
  * WholeStageCodegen span, dropping the whole bucket→pairs→explode
  * projection to the interpreted path.
  */
object PairExpressions {
  private[functions] val pairType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
}

/** `id_pairs(xs)` → all C(n,2) pairs of an ascending array<long> of ids
  * as (a, b) structs with a < b. Upstream must sort (and cap) the
  * bucket. */
case class IdPairs(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = PairExpressions.pairType
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val idx = ctx.freshName("idx")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      s"""
        |final int $n = $v.numElements();
        |final Object[] $out = new Object[$n * ($n - 1) / 2];
        |int $idx = 0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final long $a = $v.getLong($i);
        |  for (int $j = $i + 1; $j < $n; $j++) {
        |    $out[$idx++] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        |      new Object[] { java.lang.Long.valueOf($a), java.lang.Long.valueOf($v.getLong($j)) });
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |""".stripMargin
    })
  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = xs.getLong(i)
      var j = i + 1
      while (j < n) {
        out(idx) = new GenericInternalRow(Array[Any](a, xs.getLong(j)))
        idx += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): IdPairs = copy(child = c)
}

/** `hamming_pairs(xs, maxDist)` → pairs of an array<struct<doc_id long,
  * sig long>> (ascending by doc_id) whose signatures lie within `maxDist`
  * hamming, as (a, b) structs. The gate runs inside the loop —
  * non-matching pairs never materialize anywhere. */
case class HammingPairs(child: Expression, maxDist: Int)
    extends UnaryExpression {
  override def dataType: DataType = PairExpressions.pairType
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val ids = ctx.freshName("ids")
      val sigs = ctx.freshName("sigs")
      val row = ctx.freshName("row")
      val buf = ctx.freshName("buf")
      val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
        |final int $n = $v.numElements();
        |final long[] $ids = new long[$n];
        |final long[] $sigs = new long[$n];
        |for (int $i = 0; $i < $n; $i++) {
        |  final org.apache.spark.sql.catalyst.InternalRow $row = $v.getStruct($i, 2);
        |  $ids[$i] = $row.getLong(0);
        |  $sigs[$i] = $row.getLong(1);
        |}
        |Object[] $buf = new Object[8];
        |int $cnt = 0;
        |for (int $i = 0; $i < $n; $i++) {
        |  for (int $j = $i + 1; $j < $n; $j++) {
        |    if (java.lang.Long.bitCount($sigs[$i] ^ $sigs[$j]) <= $maxDist) {
        |      if ($cnt == $buf.length) $buf = java.util.Arrays.copyOf($buf, $buf.length * 2);
        |      $buf[$cnt++] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        |        new Object[] { java.lang.Long.valueOf($ids[$i]), java.lang.Long.valueOf($ids[$j]) });
        |    }
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |  java.util.Arrays.copyOf($buf, $cnt));
        |""".stripMargin
    })
  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val ids = new Array[Long](n)
    val sigs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = xs.getStruct(i, 2)
      ids(i) = row.getLong(0)
      sigs(i) = row.getLong(1)
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuilder.make[Any]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= maxDist)
          out += new GenericInternalRow(Array[Any](ids(i), ids(j)))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }
  override protected def withNewChildInternal(c: Expression): HammingPairs = copy(child = c)
}

object Pairs {
  def idPairs(c: Column): Column = toCol(IdPairs(toExpr(c)))
  def hammingPairs(c: Column, maxDist: Int): Column =
    toCol(HammingPairs(toExpr(c), maxDist))
}

/** Column surface for Spark's internal bloom-filter expressions, which the
  * function registry does not expose (they normally appear only via the
  * `InjectRuntimeFilter` rule). Explicit construction lets a pipeline
  * build a semi-join bloom once and prune a fact scan with it. */
object Bloom {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.GraftBridge
  import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

  /** Aggregate a bloom filter over `c` (must be xxhash64-hashed longs). */
  def bloomAgg(c: Column, estimatedItems: Long, numBits: Long): Column =
    toCol(new BloomFilterAggregate(toExpr(c), Literal(estimatedItems), Literal(numBits))
      .toAggregateExpression())

  /** `might_contain(<scalar subquery over bloomDf>, value)` — Spark
    * requires the bloom side to be constant-foldable or a scalar
    * subquery, so the 1-row bloom DataFrame is embedded as one. */
  def mightContain(bloomDf: DataFrame, value: Column): Column =
    toCol(BloomFilterMightContain(
      ScalarSubquery(GraftBridge.analyzedPlan(bloomDf)), toExpr(value)))
}
