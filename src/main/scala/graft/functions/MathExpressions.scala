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

/** `char_entropy_sum(text)` → Σ_c round(k_c · ln k_c, 9) over the text's
  * per-codepoint frequencies k_c, as DECIMAL(28, 9).
  *
  * The single-pass, row-shaped kernel of q_doc_entropy: the original
  * formulation exploded one row PER CHARACTER and shuffled ~75M rows at
  * sf1 through a (doc_id, char) exchange (19.9 s in the sf1 ledger);
  * per-doc entropy is a pure function of the row, so this expression
  * builds the frequency histogram in one local pass (int[128] ASCII fast
  * path + codepoint map fallback) and the whole query becomes scan →
  * project with ZERO pre-sort exchanges.
  *
  * Exactness discipline (hash parity with the unchanged DuckDB oracle):
  * each term replicates Spark's `cast(round(k·ln k, 9) AS DECIMAL(18,9))`
  * bit-for-bit — `BigDecimal.valueOf` (Double.toString semantics, what
  * both Spark's Round-on-double and its double→decimal cast use) →
  * setScale(9, HALF_UP) → back through the double — and terms sum
  * EXACTLY at scale 9, so the result equals the old
  * `sum(cast(round(...) as decimal(18,9)))` including its
  * DECIMAL(28, 9) sum type. ln via `Math.log` ([[PortableLn]]'s libm
  * rationale). */
case class CharEntropySum(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.DecimalType(28, 9)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"char_entropy_sum needs STRING input, got ${child.dataType}")
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.CharEntropy.sumDecimal($v)")
  override def nullSafeEval(input: Any): Any =
    CharEntropy.sumDecimal(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression): CharEntropySum =
    copy(child = c)
}

object CharEntropy {
  import java.math.{BigDecimal => JBD, RoundingMode}
  def sumDecimal(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.types.Decimal = {
    val str = s.toString
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Integer] = null
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Integer]()
        other.merge(cp, 1, (a: Integer, b: Integer) => Integer.valueOf(a + b))
        ()
      }
      i += Character.charCount(cp)
    }
    var sum = JBD.ZERO
    def add(k: Int): Unit = if (k > 0) {
      val t = k.toDouble * Math.log(k.toDouble)
      // Spark's Round(double, 9) goes BigDecimal.valueOf → HALF_UP →
      // toDouble, and its double→decimal cast goes BigDecimal.valueOf →
      // changePrecision HALF_UP; replicated exactly so the sum matches
      // the exploded formulation term-for-term
      val r = JBD.valueOf(t).setScale(9, RoundingMode.HALF_UP).doubleValue()
      sum = sum.add(JBD.valueOf(r).setScale(9, RoundingMode.HALF_UP))
    }
    var c = 0
    while (c < 128) { add(ascii(c)); c += 1 }
    if (other != null) {
      // deterministic order is irrelevant — scale-9 addition is exact —
      // but sort anyway so any future lossy change fails loudly in tests
      val ks = new java.util.ArrayList(other.keySet()); java.util.Collections.sort(ks)
      ks.forEach(k => add(other.get(k)))
    }
    org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(sum), 28, 9)
  }
}

/** `sparse_dot_exact(a, b)` / `sparse_dot_fast(a, b)` over two sparse
  * vectors stored as KEY-SORTED `array<struct<h: long, w: double>>` —
  * the merge-join replacement for the r12 map-probe dot of
  * `q_cosine_pairs` (r14 optimization, guide §1.2 step 2 "per-task
  * work"). The map form walked `aggregate(map_keys(a), ...)` with an
  * `element_at` probe per key, and Spark's `GetMapValue` is a LINEAR
  * scan of the key array — so each dot cost O(|a|·|b|); the r14 stage
  * attribution measured the verification stage at 18.4 s task-sum with
  * a 4.9 s max task at sf0.1. A two-pointer merge over the sorted key
  * arrays computes the identical term multiset in O(|a|+|b|).
  *
  * Exactness discipline (hash parity with the unchanged DuckDB oracle,
  * the [[CharEntropySum]] protocol): per intersecting key, the term is
  * `round(wa·wb, 9)` replicated bit-for-bit — `BigDecimal.valueOf`
  * (Double.toString semantics, what Spark's Round-on-double uses) →
  * setScale(9, HALF_UP) → back through the double — and terms sum
  * EXACTLY in scale-9 units (a long: |term| ≤ 1 for unit vectors and
  * ≪ 2^53/1e9 terms, so no overflow), then out through the same
  * decimal→double cast the old `CAST(... AS DOUBLE)` performed. Keys
  * missing from one side contributed `round(wa·0, 9) = 0` in the map
  * form — skipping them is exact. The fast form is the plain double
  * product sum over the intersection (the candidate PREFILTER only —
  * its consumer gates at t − 1e-4 against a proven < 1e-5 error bound,
  * which is summation-order-independent, so the survivor superset still
  * contains every qualifying pair).
  *
  * A duplicate key within one side would have been a LOUD
  * `map_from_entries` failure under mapKeyDedupPolicy=EXCEPTION in the
  * map form (an in-doc xxhash64 collision, p ≈ 3e-14 per document);
  * the merge keeps that discipline and throws. */
case class SparseDotExact(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SparseDot.exact($a, $b)")
  override def nullSafeEval(l: Any, r: Any): Any =
    SparseDot.exact(l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SparseDotExact =
    copy(left = l, right = r)
}

case class SparseDotFast(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SparseDot.fast($a, $b)")
  override def nullSafeEval(l: Any, r: Any): Any =
    SparseDot.fast(l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SparseDotFast =
    copy(left = l, right = r)
}

object SparseDot {
  import java.math.{BigDecimal => JBD, RoundingMode}
  import org.apache.spark.sql.catalyst.util.ArrayData

  @inline private def dupe(k: Long): Nothing = throw new IllegalStateException(
    s"sparse_dot: duplicate key $k within one vector — in-doc hash collision; " +
      "the map form failed loudly here too (mapKeyDedupPolicy=EXCEPTION)")

  /** Exact scale-9 decimal dot (see scaladoc above): returns the same
    * double the old map-walk `CAST(SUM(round-9 decimal terms) AS DOUBLE)`
    * produced. Callers apply the final `round(·, 6)` in the plan. */
  def exact(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    var sum = 0L // exact scale-9 units
    var ka = if (na > 0) a.getStruct(0, 2).getLong(0) else 0L
    var kb = if (nb > 0) b.getStruct(0, 2).getLong(0) else 0L
    while (i < na && j < nb) {
      if (ka < kb) {
        i += 1
        if (i < na) { val k2 = a.getStruct(i, 2).getLong(0); if (k2 == ka) dupe(ka); ka = k2 }
      } else if (kb < ka) {
        j += 1
        if (j < nb) { val k2 = b.getStruct(j, 2).getLong(0); if (k2 == kb) dupe(kb); kb = k2 }
      } else {
        val t = a.getStruct(i, 2).getDouble(1) * b.getStruct(j, 2).getDouble(1)
        val r = JBD.valueOf(t).setScale(9, RoundingMode.HALF_UP).doubleValue()
        sum += JBD.valueOf(r).setScale(9, RoundingMode.HALF_UP)
          .unscaledValue().longValueExact()
        i += 1; j += 1
        if (i < na) { val k2 = a.getStruct(i, 2).getLong(0); if (k2 == ka) dupe(ka); ka = k2 }
        if (j < nb) { val k2 = b.getStruct(j, 2).getLong(0); if (k2 == kb) dupe(kb); kb = k2 }
      }
    }
    // r15 (ADVICE): the merge loop above only checks adjacency while BOTH
    // pointers are live — finish scanning whichever side remains so the
    // "keeps the map form's loud-failure discipline" guarantee is total,
    // not partial (tail keys contribute no terms, but a duplicate there
    // was still a loud map_from_entries failure in the old form)
    while (i + 1 < na) {
      val k2 = a.getStruct(i + 1, 2).getLong(0)
      if (k2 == a.getStruct(i, 2).getLong(0)) dupe(k2)
      i += 1
    }
    while (j + 1 < nb) {
      val k2 = b.getStruct(j + 1, 2).getLong(0)
      if (k2 == b.getStruct(j, 2).getLong(0)) dupe(k2)
      j += 1
    }
    new JBD(java.math.BigInteger.valueOf(sum), 9).doubleValue()
  }

  /** Plain double dot over the intersection, ascending-key order — the
    * prefilter form (consumers must gate with a slack ≥ the documented
    * 1e-5 bound, which holds for any summation order). Duplicate keys
    * throw exactly like [[exact]] (r15, ADVICE): a silent skip here would
    * UNDERESTIMATE the prefilter dot and could drop a qualifying pair at
    * the t − 1e-4 gate before the loud exact dot ever evaluates it. */
  def fast(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    var sum = 0.0
    var pa = Long.MinValue; var hasPa = false
    var pb = Long.MinValue; var hasPb = false
    while (i < na && j < nb) {
      val ka = a.getStruct(i, 2).getLong(0)
      val kb = b.getStruct(j, 2).getLong(0)
      if (hasPa && ka == pa) dupe(ka)
      if (hasPb && kb == pb) dupe(kb)
      if (ka < kb) { pa = ka; hasPa = true; i += 1 }
      else if (kb < ka) { pb = kb; hasPb = true; j += 1 }
      else {
        sum += a.getStruct(i, 2).getDouble(1) * b.getStruct(j, 2).getDouble(1)
        pa = ka; hasPa = true; pb = kb; hasPb = true
        i += 1; j += 1
      }
    }
    while (i < na) {
      val ka = a.getStruct(i, 2).getLong(0)
      if (hasPa && ka == pa) dupe(ka)
      pa = ka; hasPa = true; i += 1
    }
    while (j < nb) {
      val kb = b.getStruct(j, 2).getLong(0)
      if (hasPb && kb == pb) dupe(kb)
      pb = kb; hasPb = true; j += 1
    }
    sum
  }
}

object PortableMath {
  import org.apache.spark.sql.GraftBridge.{toCol, toExpr}
  /** Column surface for [[PortableLn]]. */
  def lnPortable(c: Column): Column =
    toCol(PortableLn(toExpr(c.cast("double"))))
  /** Column surface for [[CharEntropySum]]. */
  def charEntropySum(c: Column): Column =
    toCol(CharEntropySum(toExpr(c)))
  /** Column surface for [[BitInterleave]] over int bucket ids. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    toCol(BitInterleave(toExpr(a.cast("int")), toExpr(b.cast("int")), bits))
  /** Column surfaces for [[SparseDotExact]] / [[SparseDotFast]] over
    * key-sorted array<struct<h: long, w: double>> sparse vectors. */
  def sparseDotExact(a: Column, b: Column): Column =
    toCol(SparseDotExact(toExpr(a), toExpr(b)))
  def sparseDotFast(a: Column, b: Column): Column =
    toCol(SparseDotFast(toExpr(a), toExpr(b)))
}
