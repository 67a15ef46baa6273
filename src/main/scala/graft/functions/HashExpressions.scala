package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftBridge.{toCol, toExpr}

/** Deterministic 64-bit hashing utilities shared by the sketch expressions.
  *
  * MinHash uses the standard one-hash + k universal permutations scheme:
  * each shingle is hashed once with xxhash64, then permuted k times with
  * `a_i * h + b_i` (odd multipliers) — k multiply-adds per shingle instead
  * of k full hashes. Constants derive from splitmix64 so signatures are
  * stable across JVMs/runs (a requirement for any dedup job that resumes or
  * runs incrementally at 100 TB).
  */
object HashUtil {
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** k (a, b) permutation constants; a forced odd. */
  def perms(k: Int): Array[(Long, Long)] =
    Array.tabulate(k)(i => (splitmix64(2L * i) | 1L, splitmix64(2L * i + 1)))

  def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
}

/** `minhashes(shingles, k)` → array<long> of k MinHash values.
  *
  * One pass over the shingle array per row; null shingles are skipped.
  * Empty arrays yield Long.MaxValue signatures (never collides with a real
  * band). SURVEY.md §7.2 step 7 (MinHash dedup); the LSH banding that
  * consumes these is in [[BandHashes]].
  */
case class MinHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  private lazy val ab = HashUtil.perms(k)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val base = HashUtil.hashUtf8(arr.getUTF8String(j), 42L)
        var i = 0
        while (i < k) {
          val v = ab(i)._1 * base + ab(i)._2
          if (v < out(i)) out(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): MinHashes = copy(child = c)
}

/** `bandhashes(signature, r)` → array<long> of len/r LSH band hashes.
  * Band i chains xxhash64 over signature[i*r .. i*r+r-1] seeded with the
  * band index, so identical sub-signatures in different bands never collide.
  */
case class BandHashes(child: Expression, r: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // a CodegenFallback PARENT evaluates its whole subtree interpreted, so
  // this must participate in codegen or the fused minhash below it never
  // JITs inside bandhashes(shingle_minhashes(...)) pipelines
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sig => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
        |final int $b = $sig.numElements() / $r;
        |final long[] $out = new long[$b];
        |for (int $i = 0; $i < $b; $i++) {
        |  long $h = (long) $i;
        |  for (int $j = 0; $j < $r; $j++) {
        |    $h = $xxh.hashLong($sig.getLong($i * $r + $j), $h);
        |  }
        |  $out[$i] = $h;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |""".stripMargin
    })

  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val b = sig.numElements() / r
    val out = new Array[Long](b)
    var i = 0
    while (i < b) {
      var h = i.toLong
      var j = 0
      while (j < r) {
        h = XXH64.hashLong(sig.getLong(i * r + j), h)
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): BandHashes = copy(child = c)
}

/** `shingle_minhashes(words, n, k)` → k MinHash values over word
  * n-shingles, fused: word hashes are computed once, each shingle is a
  * hash-chain of its n word hashes, and permutation minima update in
  * place. Compared to building shingle STRINGS (`transform` + `concat_ws`
  * + `array_distinct`) and minhashing those, this skips ~300 string
  * allocations and an O(s²) distinct per document — min is idempotent, so
  * duplicate shingles need no dedup. Candidate generation only; the
  * exact-jaccard verification still uses string shingles (oracle parity).
  */
case class ShingleMinHashes(child: Expression, n: Int, k: Int)
    extends UnaryExpression {
  private lazy val ab = HashUtil.perms(k)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // the LSH pipelines' hottest loop: fused shingle-hash + k permutations,
  // emitted inline so the whole candidate-generation projection stays in
  // whole-stage codegen (was CodegenFallback → interpreted per row)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pa = ctx.addReferenceObj("minhashA", ab.map(_._1), "long[]")
    val pb = ctx.addReferenceObj("minhashB", ab.map(_._2), "long[]")
    nullSafeCodeGen(ctx, ev, words => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val wh = ctx.freshName("wh")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val s = ctx.freshName("s")
      s"""
        |final int $m = $words.numElements();
        |final long[] $out = new long[$k];
        |java.util.Arrays.fill($out, Long.MAX_VALUE);
        |if ($m >= $n) {
        |  final long[] $wh = new long[$m];
        |  for (int $i = 0; $i < $m; $i++) {
        |    if ($words.isNullAt($i)) { $wh[$i] = 0L; } else {
        |      org.apache.spark.unsafe.types.UTF8String $s = $words.getUTF8String($i);
        |      $wh[$i] = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
        |    }
        |  }
        |  for (int $j = 0; $j <= $m - $n; $j++) {
        |    long $h = 17L;
        |    for (int $t = 0; $t < $n; $t++) { $h = $xxh.hashLong($wh[$j + $t], $h); }
        |    for (int $p = 0; $p < $k; $p++) {
        |      final long $v = $pa[$p] * $h + $pb[$p];
        |      if ($v < $out[$p]) { $out[$p] = $v; }
        |    }
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |""".stripMargin
    })
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements()
    val out = Array.fill(k)(Long.MaxValue)
    if (m >= n) {
      val wh = new Array[Long](m)
      var i = 0
      while (i < m) {
        wh(i) = if (words.isNullAt(i)) 0L
          else HashUtil.hashUtf8(words.getUTF8String(i), 42L)
        i += 1
      }
      var j = 0
      while (j <= m - n) {
        var h = 17L
        var t = 0
        while (t < n) { h = XXH64.hashLong(wh(j + t), h); t += 1 }
        var p = 0
        while (p < k) {
          val v = ab(p)._1 * h + ab(p)._2
          if (v < out(p)) out(p) = v
          p += 1
        }
        j += 1
      }
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): ShingleMinHashes = copy(child = c)
}

/** `shingle_simhash64(words, n)` → SimHash over hash-chained word
  * n-shingles — same fusion as [[ShingleMinHashes]] (no shingle strings).
  * Duplicate shingles vote multiple times (SimHash is weighted by
  * occurrence), matching SimHash64-over-shingle-multiset semantics up to
  * the distinctness the string pipeline applied. */
case class ShingleSimHash64(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, words => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val wh = ctx.freshName("wh")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val bit = ctx.freshName("bit")
      val h = ctx.freshName("h")
      val res = ctx.freshName("res")
      val s = ctx.freshName("s")
      s"""
        |final int $m = $words.numElements();
        |final int[] $acc = new int[64];
        |if ($m >= $n) {
        |  final long[] $wh = new long[$m];
        |  for (int $i = 0; $i < $m; $i++) {
        |    if ($words.isNullAt($i)) { $wh[$i] = 0L; } else {
        |      org.apache.spark.unsafe.types.UTF8String $s = $words.getUTF8String($i);
        |      $wh[$i] = $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
        |    }
        |  }
        |  for (int $j = 0; $j <= $m - $n; $j++) {
        |    long $h = 7L;
        |    for (int $t = 0; $t < $n; $t++) { $h = $xxh.hashLong($wh[$j + $t], $h); }
        |    for (int $bit = 0; $bit < 64; $bit++) {
        |      if ((($h >>> $bit) & 1L) == 1L) { $acc[$bit]++; } else { $acc[$bit]--; }
        |    }
        |  }
        |}
        |long $res = 0L;
        |for (int $bit = 0; $bit < 64; $bit++) {
        |  if ($acc[$bit] > 0) { $res |= (1L << $bit); }
        |}
        |${ev.value} = $res;
        |""".stripMargin
    })

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements()
    val acc = new Array[Int](64)
    if (m >= n) {
      val wh = new Array[Long](m)
      var i = 0
      while (i < m) {
        wh(i) = if (words.isNullAt(i)) 0L
          else HashUtil.hashUtf8(words.getUTF8String(i), 42L)
        i += 1
      }
      var j = 0
      while (j <= m - n) {
        var h = 7L
        var t = 0
        while (t < n) { h = XXH64.hashLong(wh(j + t), h); t += 1 }
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
          bit += 1
        }
        j += 1
      }
    }
    var res = 0L
    var bit = 0
    while (bit < 64) {
      if (acc(bit) > 0) res |= (1L << bit)
      bit += 1
    }
    res
  }
  override protected def withNewChildInternal(c: Expression): ShingleSimHash64 = copy(child = c)
}

/** `simhash64(tokens)` → 64-bit SimHash of a token array.
  * Per-bit vote of each token's xxhash64; near-duplicate texts land within
  * a small Hamming distance. Verify with `bit_count(a ^ b)` (built-in).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h = HashUtil.hashUtf8(arr.getUTF8String(j), 7L)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
          bit += 1
        }
      }
      j += 1
    }
    var res = 0L
    var bit = 0
    while (bit < 64) {
      if (acc(bit) > 0) res |= (1L << bit)
      bit += 1
    }
    res
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** `cosine_sim(a, b)` → double cosine similarity of two float vectors.
  *
  * Single fused pass (dot + both norms) in double precision — the hot inner
  * loop of similarity search. Participates in whole-stage codegen
  * (`doGenCode` emits the fused loop inline), so a pairwise-similarity scan
  * stays one tight JIT'd loop instead of per-row interpreted eval. Returns
  * null on length mismatch or zero-norm input.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    final double $x = (double) $a.getFloat($i);
        |    final double $y = (double) $b.getFloat($i);
        |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |  }
        |  if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
        |  else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
        |}""".stripMargin
    })

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** `winnow64(text, k, w)` → order-independent fingerprint of a document:
  * XOR of the winnowed set of k-gram rolling hashes (min hash per window of
  * w). Robust to small edits anywhere outside the changed region —
  * the classic local document fingerprinting scheme (Schleimer et al.,
  * SIGMOD'03 "Winnowing: Local Algorithms for Document Fingerprinting").
  *
  * FINGERPRINT VERSION 2: v1 XOR'd every window minimum (so a hash re-picked
  * an even number of times cancelled out); v2 XORs the DISTINCT minima set.
  * Values differ from v1 — any fingerprints persisted by a v1 run must be
  * recomputed, never mixed with v2 output. Incremental-dedup stores should
  * key their tables by this version.
  */
case class Winnow64(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  // static-call codegen: the loop body lives once in the companion (a
  // static forwarder Janino can call), so whole-stage codegen stays
  // unbroken without duplicating the algorithm in generated-Java text
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.Winnow64.compute($v, $k, $w)")
  override def nullSafeEval(input: Any): Any =
    Winnow64.compute(input.asInstanceOf[UTF8String], k, w)
  override protected def withNewChildInternal(c: Expression): Winnow64 = copy(child = c)
}

object Winnow64 {
  def compute(u: UTF8String, k: Int, w: Int): Long = {
    val s = u.toString
    if (s.length < k) return 0L
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 1125899906842597L
      var j = 0
      while (j < k) { h = 31 * h + s.charAt(i + j); j += 1 }
      hashes(i) = HashUtil.splitmix64(h)
      i += 1
    }
    // fingerprint = XOR over the DISTINCT set of window minima (classic
    // winnowing set semantics): a hash picked from several overlapping
    // windows — or re-picked non-consecutively an even number of times —
    // contributes exactly once, so nothing can cancel out, and no sentinel
    // value is ever confused with a real hash
    val selected = new java.util.HashSet[java.lang.Long]()
    var res = 0L
    i = 0
    val windows = math.max(1, n - w + 1)
    while (i < windows) {
      var m = Long.MaxValue
      var j = i
      val end = math.min(i + w, n)
      while (j < end) { if (hashes(j) < m) m = hashes(j); j += 1 }
      if (selected.add(m)) res ^= m
      i += 1
    }
    res
  }
}

/** `rh_signature(vec, nBits)` → LSH signature of a float vector under
  * `nBits` fixed pseudo-random hyperplanes (sign of the dot product per
  * plane). Hyperplane components derive deterministically from splitmix64,
  * so signatures are stable across executors/runs — vectors bucketed by
  * signature band give an O(n) candidate generation path for ANN search.
  *
  * `planeOffset` selects a disjoint block of the fixed plane family, so a
  * pipeline needing more than 64 planes stacks several signature columns
  * (offsets 0, 64, 128, …) without correlated bits.
  */
case class RandomHyperplaneSig(child: Expression, nBits: Int, dim: Int,
    planeOffset: Int = 0)
    extends UnaryExpression {
  // nBits × dim matrix of ~N(0,1)-ish components in [-1, 1)
  private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nBits, dim)((b, i) =>
      HashUtil.splitmix64((planeOffset + b).toLong * 131071L + i).toDouble / Long.MaxValue.toDouble)
  override def dataType: DataType = LongType

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pl = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val p = ctx.freshName("p")
      s"""
        |final int $n = java.lang.Math.min($dim, $v.numElements());
        |long $sig = 0L;
        |for (int $b = 0; $b < $nBits; $b++) {
        |  double $dot = 0.0;
        |  final double[] $p = $pl[$b];
        |  for (int $i = 0; $i < $n; $i++) { $dot += $v.getFloat($i) * $p[$i]; }
        |  if ($dot >= 0) { $sig |= (1L << $b); }
        |}
        |${ev.value} = $sig;
        |""".stripMargin
    })
  }
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var i = 0
      val p = planes(b)
      while (i < n) { dot += v.getFloat(i) * p(i); i += 1 }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
  override protected def withNewChildInternal(c: Expression): RandomHyperplaneSig = copy(child = c)
}

/** `jaccard_shingles(a, b, n)` → exact Jaccard similarity of the word
  * n-shingle SETS of two texts, fused into one pass.
  *
  * Replaces the SQL formulation `size(array_intersect(sh(a), sh(b))) /
  * size(array_union(sh(a), sh(b)))` where `sh` builds shingle-string
  * arrays with `transform(sequence(...), i -> concat_ws(split(c,' ')[i]…))`
  * — Catalyst does not CSE inside lambdas, so that shape re-ran
  * `split(text)` per array ELEMENT and the whole sh() twice per side
  * (intersect + union): ~4 full re-tokenizations per candidate pair,
  * measured as the dominant cost of the dedup verify joins at scale.
  * Semantics are identical (split on single space keeping empties,
  * space-joined shingles, set comparison), so DuckDB oracles are
  * unaffected: counts are integers and the final division is exact.
  * Returns null when either text has fewer than n words (candidate
  * generation already excludes those). */
case class JaccardShingles(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  // static-call codegen (this expression runs once per CANDIDATE PAIR in
  // every LSH verify join — the dedup family's hot loop): the generated
  // code calls the boxed companion method, keeping the surrounding
  // bucket→pairs→verify projection inside whole-stage codegen
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val res = ctx.freshName("jac")
      s"""
        |final java.lang.Double $res = graft.functions.JaccardShingles.computeBoxed($a, $b, $n);
        |if ($res == null) { ${ev.isNull} = true; }
        |else { ${ev.value} = $res.doubleValue(); }
        |""".stripMargin
    })
  override def nullSafeEval(l: Any, r: Any): Any =
    JaccardShingles.computeBoxed(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], n)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardShingles =
    copy(left = l, right = r)
}

object JaccardShingles {
  private def shingles(s: String, n: Int): java.util.HashSet[String] = {
    val ws = s.split(" ", -1)
    val set = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= ws.length) {
      sb.setLength(0)
      var t = 0
      while (t < n) { if (t > 0) sb.append(' '); sb.append(ws(i + t)); t += 1 }
      set.add(sb.toString)
      i += 1
    }
    set
  }
  /** Boxed so generated code can branch on the below-n null contract. */
  def computeBoxed(l: UTF8String, r: UTF8String, n: Int): java.lang.Double = {
    val a = shingles(l.toString, n)
    val b = shingles(r.toString, n)
    if (a.isEmpty || b.isEmpty) return null
    var inter = 0
    val it = a.iterator()
    while (it.hasNext) if (b.contains(it.next())) inter += 1
    inter.toDouble / (a.size + b.size - inter).toDouble
  }
}

/** `nearest_cells(vec, codebook, n)` → indices of the `n` codebook
  * centroids most cosine-similar to `vec` (ties → lower index), as
  * array<int>.
  *
  * The codebook is a constructor constant (driver-trained k-means
  * centroids, broadcast with the serialized expression) — IVF cell
  * assignment becomes pure per-row compute in the scan stage: no crossed
  * frame, no window, no shuffle. Replaces the round-1 shape that crossed
  * the corpus with the codebook and ran `row_number()` over a
  * `Window.partitionBy(vec_id)` — a full shuffle of |codebook|× the corpus
  * just to take an argmax. */
case class NearestCells(child: Expression, codebook: Seq[Seq[Float]], n: Int)
    extends UnaryExpression {
  private lazy val cb: Array[Array[Float]] = codebook.map(_.toArray).toArray
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // assignment runs once per corpus row in the scan stage — keep it in
  // whole-stage codegen like the rest of the projection
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebook", cb, "float[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val k = cb.length
      val outN = math.min(n, k)
      val scores = ctx.freshName("scores")
      val used = ctx.freshName("used")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val cv = ctx.freshName("cv")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val best = ctx.freshName("best")
      val bs = ctx.freshName("bs")
      s"""
        |final double[] $scores = new double[$k];
        |for (int $c = 0; $c < $k; $c++) {
        |  final float[] $cv = $cbRef[$c];
        |  final int $m = java.lang.Math.min($v.numElements(), $cv.length);
        |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |  for (int $i = 0; $i < $m; $i++) {
        |    final double $x = (double) $v.getFloat($i);
        |    final double $y = (double) $cv[$i];
        |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |  }
        |  $scores[$c] = ($na == 0.0 || $nb == 0.0) ? Double.NEGATIVE_INFINITY
        |    : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        |}
        |final int[] $out = new int[$outN];
        |final boolean[] $used = new boolean[$k];
        |for (int $j = 0; $j < $outN; $j++) {
        |  int $best = -1; double $bs = Double.NEGATIVE_INFINITY;
        |  for (int $i = 0; $i < $k; $i++) {
        |    if (!$used[$i] && $scores[$i] > $bs) { $bs = $scores[$i]; $best = $i; }
        |  }
        |  if ($best < 0) { // zero-norm input: every score -inf; take first unused
        |    for (int $i = 0; $i < $k; $i++) { if (!$used[$i]) { $best = $i; break; } }
        |  }
        |  $used[$best] = true; $out[$j] = $best;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |""".stripMargin
    })
  }
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val k = cb.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cb(c)
      val m = math.min(v.numElements(), cv.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < m) {
        val x = v.getFloat(i).toDouble; val y = cv(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      scores(c) = if (na == 0.0 || nb == 0.0) Double.NegativeInfinity
        else dot / (math.sqrt(na) * math.sqrt(nb))
      c += 1
    }
    val out = new Array[Int](math.min(n, k))
    val used = new Array[Boolean](k)
    var j = 0
    while (j < out.length) {
      var best = -1; var bs = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!used(i) && scores(i) > bs) { bs = scores(i); best = i }
        i += 1
      }
      if (best < 0) { // zero-norm input: every score -inf; take first unused
        i = 0
        while (i < k && best < 0) { if (!used(i)) best = i; i += 1 }
      }
      used(best) = true; out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): NearestCells = copy(child = c)
}

/** `cdc_chunks(text, minLen, maskBits, maxLen)` → array<struct<start:int,
  * len:int, hash:bigint>>: content-defined chunking via a Gear rolling
  * hash (the FastCDC family: Xia et al., USENIX ATC'16). A chunk boundary
  * falls wherever the low `maskBits` bits of the rolling hash are zero
  * (expected chunk ≈ 2^maskBits chars), clamped to [minLen, maxLen] —
  * boundaries depend only on a sliding content window, so an insertion
  * anywhere reshuffles O(1) nearby chunks and every other chunk keeps its
  * identity. That shift-robustness is what fixed-width chunk dedup
  * (Dedup chunk queries) fundamentally lacks: one leading edit re-keys
  * every downstream fixed chunk, but CDC chunk hashes realign.
  *
  * The gear table and content hashes derive from splitmix64/xxhash64, so
  * chunk identities are stable across JVMs, runs, and partitionings — the
  * incremental-dedup-store requirement. Scan-stage only: the expression
  * emits per-row chunk descriptors; corpus-level dedup is then ordinary
  * relational algebra over (hash, len).
  */
case class CdcChunks(child: Expression, minLen: Int, maskBits: Int, maxLen: Int)
    extends UnaryExpression {
  require(minLen >= 1 && maxLen >= minLen && maskBits >= 1 && maskBits < 30,
    s"invalid CDC parameters min=$minLen mask=$maskBits max=$maxLen")
  override def dataType: DataType = CdcChunks.schema
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.CdcChunks.compute($v, $minLen, $maskBits, $maxLen)")
  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], minLen, maskBits, maxLen)
  override protected def withNewChildInternal(c: Expression): CdcChunks =
    copy(child = c)
}

object CdcChunks {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)

  /** 256-entry gear table, fixed across runs. */
  private val gear: Array[Long] = Array.tabulate(256)(i => HashUtil.splitmix64(0xCDC0L + i))

  def compute(u: UTF8String, minLen: Int, maskBits: Int, maxLen: Int): ArrayData = {
    val s = u.toString
    val n = s.length
    val mask = (1L << maskBits) - 1
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + gear(s.charAt(i) & 0xFF)
      val len = i - start + 1
      val cut = (len >= minLen && (h & mask) == 0L) || len >= maxLen || i == n - 1
      if (cut) {
        // content hash of the chunk: polynomial hash → splitmix finalize
        var ch = 1125899906842597L
        var j = start
        while (j <= i) { ch = 31 * ch + s.charAt(j); j += 1 }
        out += InternalRow(start, len, HashUtil.splitmix64(ch))
        start = i + 1
        // h is NOT reset: `h << 1` ages a char out of the hash entirely
        // after 64 steps, so the gear acts as a 64-char sliding window and
        // cut decisions stay purely content-local — the property that
        // re-synchronizes chunk boundaries just past an edit (unlike
        // FastCDC's per-chunk reset, which only converges empirically)
      }
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `window_hashes(text, L)` → array<long>: a rolling polynomial hash of
  * every length-`L` codepoint window of the text (index i = window
  * starting at codepoint i; empty array when the text is shorter than L).
  *
  * The scan-stage kernel of exact substring-level dedup (the suffix-array
  * family: Lee et al., "Deduplicating Training Data Makes Language Models
  * Better", ACL'22): any substring duplicated across the corpus at length
  * ≥ L contains a duplicated L-window at every offset, so grouping window
  * hashes finds all of them. Rabin–Karp keeps it O(n) per document — one
  * multiply-add to shift a codepoint in, one to age the oldest out
  * (precomputed B^(L-1)) — vs O(n·L) for hashing each window afresh; a
  * splitmix64 finalizer (a bijection — it adds dispersion without adding
  * collisions) decorrelates the weak low bits of the mod-2^64 polynomial.
  * Windows are codepoints, not UTF-16 units, to agree with SQL substr
  * semantics in Spark and DuckDB — the downstream verification join
  * compares `substr(text, pos+1, L)` across engines.
  */
case class WindowHashes(child: Expression, win: Int) extends UnaryExpression {
  require(win >= 2 && win <= 4096, s"window length must be in [2,4096], got $win")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.WindowHashes.compute($v, $win)")
  override def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[UTF8String], win)
  override protected def withNewChildInternal(c: Expression): WindowHashes =
    copy(child = c)
}

object WindowHashes {
  private val B = 0x100000001b3L // FNV-1a prime, odd → invertible mod 2^64

  def compute(u: UTF8String, win: Int): ArrayData = {
    val cps = u.toString.codePoints().toArray
    val n = cps.length
    if (n < win) return new GenericArrayData(Array.emptyLongArray)
    // B^(win-1) mod 2^64, for aging the oldest codepoint out of the hash
    var bl1 = 1L
    var e = 0
    while (e < win - 1) { bl1 *= B; e += 1 }
    val out = new Array[Long](n - win + 1)
    var h = 0L
    var i = 0
    while (i < win) { h = h * B + cps(i); i += 1 }
    out(0) = HashUtil.splitmix64(h)
    while (i < n) {
      h = (h - cps(i - win) * bl1) * B + cps(i)
      out(i - win + 1) = HashUtil.splitmix64(h)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `max_token_count(words)` → the maximum multiplicity of any element of
  * a string array (0 for empty/null-only arrays).
  *
  * The row-shaped kernel of the Gopher most-frequent-token signal
  * (q_doc_repetition): the quantity is a pure function of the row, but
  * the original formulation computed it with explode → groupBy(doc_id,
  * token) → per-doc max → join — two exchanges and a join for what one
  * local hash count answers (the q_doc_entropy shape lesson, same
  * round). One pass, one small HashMap per row, codegen via a static
  * call so the projection stays inside WholeStageCodegen. */
case class MaxTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"max_token_count needs ARRAY<STRING>, got $other")
    }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.MaxTokenCount.maxMultiplicity($v)")
  override def nullSafeEval(input: Any): Any =
    MaxTokenCount.maxMultiplicity(input.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression): MaxTokenCount =
    copy(child = c)
}

object MaxTokenCount {
  // named distinctly from Expression.eval so scalac emits the static
  // forwarder Janino needs (same-named members suppress forwarders)
  def maxMultiplicity(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts =
      new java.util.HashMap[UTF8String, java.lang.Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val k = arr.getUTF8String(i)
        val prev = counts.get(k)
        val c = if (prev == null) 1 else prev.intValue() + 1
        counts.put(k, java.lang.Integer.valueOf(c))
        if (c > best) best = c
      }
      i += 1
    }
    best.toLong
  }
}

/** Column-API surface for the custom expressions (classic-session bridge:
  * Spark 4 moved Column↔Expression conversion to sql.classic). */
object Sketches {
  def maxTokenCount(c: Column): Column = toCol(MaxTokenCount(toExpr(c)))
  def minhashes(c: Column, k: Int): Column = toCol(MinHashes(toExpr(c), k))
  def shingleMinhashes(words: Column, n: Int, k: Int): Column =
    toCol(ShingleMinHashes(toExpr(words), n, k))
  def shingleSimhash64(words: Column, n: Int): Column =
    toCol(ShingleSimHash64(toExpr(words), n))
  def bandhashes(c: Column, r: Int): Column = toCol(BandHashes(toExpr(c), r))
  def simhash64(c: Column): Column = toCol(SimHash64(toExpr(c)))
  def cosineSim(a: Column, b: Column): Column = toCol(CosineSim(toExpr(a), toExpr(b)))
  def winnow64(c: Column, k: Int = 5, w: Int = 8): Column = toCol(Winnow64(toExpr(c), k, w))
  def rhSignature(c: Column, nBits: Int, dim: Int, planeOffset: Int = 0): Column =
    toCol(RandomHyperplaneSig(toExpr(c), nBits, dim, planeOffset))
  def nearestCells(c: Column, codebook: Seq[Seq[Float]], n: Int): Column =
    toCol(NearestCells(toExpr(c), codebook, n))
  def jaccardShingles(a: Column, b: Column, n: Int): Column =
    toCol(JaccardShingles(toExpr(a), toExpr(b), n))
  def cdcChunks(c: Column, minLen: Int = 16, maskBits: Int = 6,
                maxLen: Int = 256): Column =
    toCol(CdcChunks(toExpr(c), minLen, maskBits, maxLen))
  def windowHashes(c: Column, win: Int): Column =
    toCol(WindowHashes(toExpr(c), win))
}
