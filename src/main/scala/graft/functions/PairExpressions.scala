package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftBridge.{toCol, toExpr}

/** In-bucket LSH pair expansion as tight primitive loops.
  *
  * The SQL formulation (`flatten(transform(xs, (x,i) -> transform(slice(
  * xs,...), y -> struct(...))))`) allocates one Catalyst struct per
  * candidate pair — 12M+ heap rows for a corpus of a few thousand docs —
  * and that allocation, not the arithmetic, dominated the LSH queries'
  * wall time (measured ~7 s of an 8 s query at sf0.1). These expressions
  * emit each pair as ONE packed long `(a << 32) | b` from a primitive
  * loop: the downstream `distinct` dedups 8-byte longs instead of structs
  * and the ids unpack after.
  *
  * Packing requires ids in [0, 2^32) — violated ids throw (loudly, not
  * silently corrupting pairs). A deployment with a wider id space swaps
  * the pack for the struct-emitting SQL shape at ~4× the constant cost.
  *
  * Both expressions carry `doGenCode`: the loop itself is plain JVM code
  * either way, but a CodegenFallback expression splits the enclosing
  * WholeStageCodegen span, dropping the whole bucket→pairs→explode
  * projection to the interpreted path. Generated and interpreted paths
  * share `PairPack.pack` (a static forwarder callable from Janino) so the
  * id-range contract throws identically in both.
  */
object PairPack {
  val idLimit: Long = 1L << 32
  @inline def pack(a: Long, b: Long): Long = {
    if (a < 0 || a >= idLimit || b < 0 || b >= idLimit)
      throw new IllegalArgumentException(
        s"packed pair ids must be in [0, 2^32): got ($a, $b)")
    (a << 32) | b
  }
}

/** `packed_pairs(xs)` → all C(n,2) pairs of an ascending array<long> of
  * ids, packed. Upstream must sort (and cap) the bucket. */
case class PackedPairs(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
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
        |final long[] $out = new long[$n * ($n - 1) / 2];
        |int $idx = 0;
        |for (int $i = 0; $i < $n; $i++) {
        |  final long $a = $v.getLong($i);
        |  for (int $j = $i + 1; $j < $n; $j++) {
        |    $out[$idx++] = graft.functions.PairPack.pack($a, $v.getLong($j));
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |""".stripMargin
    })
  override def nullSafeEval(input: Any): Any = {
    val xs = input.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Long](n * (n - 1) / 2)
    var idx = 0
    var i = 0
    while (i < n) {
      val a = xs.getLong(i)
      var j = i + 1
      while (j < n) { out(idx) = PairPack.pack(a, xs.getLong(j)); idx += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): PackedPairs = copy(child = c)
}

/** `hamming_pairs(xs, maxDist)` → pairs of an array<struct<doc_id long,
  * sig long>> (ascending by doc_id) whose signatures lie within `maxDist`
  * hamming, packed. The gate runs inside the loop — non-matching pairs
  * never materialize anywhere. */
case class HammingPairs(child: Expression, maxDist: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
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
        |long[] $buf = new long[8];
        |int $cnt = 0;
        |for (int $i = 0; $i < $n; $i++) {
        |  for (int $j = $i + 1; $j < $n; $j++) {
        |    if (java.lang.Long.bitCount($sigs[$i] ^ $sigs[$j]) <= $maxDist) {
        |      if ($cnt == $buf.length) $buf = java.util.Arrays.copyOf($buf, $buf.length * 2);
        |      $buf[$cnt++] = graft.functions.PairPack.pack($ids[$i], $ids[$j]);
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
    val out = scala.collection.mutable.ArrayBuilder.make[Long]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (java.lang.Long.bitCount(sigs(i) ^ sigs(j)) <= maxDist)
          out += PairPack.pack(ids(i), ids(j))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }
  override protected def withNewChildInternal(c: Expression): HammingPairs = copy(child = c)
}

object Pairs {
  def packedPairs(c: Column): Column = toCol(PackedPairs(toExpr(c)))
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
