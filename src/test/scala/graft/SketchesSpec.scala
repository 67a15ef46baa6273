package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.Sketches._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("minhashes: identical inputs → identical signatures, deterministic") {
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")),
      (3L, Seq("x y z", "y z w", "z w v"))).toDF("id", "sh")
    val sigs = df.select($"id", minhashes($"sh", 64).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
    assert(sigs(1L).length == 64)
    // signature agreement approximates jaccard: overlapping sets agree on
    // some components, disjoint sets on ~none
    val overlap = Seq((1L, Seq("a b c", "b c d", "q q q", "r r r"))).toDF("id", "sh")
      .select(minhashes($"sh", 64)).head.getSeq[Long](0)
    val agree = sigs(1L).zip(overlap).count { case (x, y) => x == y }
    assert(agree > 5 && agree < 60, s"agreement $agree should be partial")
  }

  test("bandhashes: 64 sig / r=4 → 16 bands; equal sigs → equal bands") {
    val df = Seq((1L, (1L to 64L).toSeq), (2L, (1L to 64L).toSeq),
      (3L, (2L to 65L).toSeq)).toDF("id", "sig")
    val bands = df.select($"id", bandhashes($"sig", 4).as("b")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(bands(1L).length == 16)
    assert(bands(1L) == bands(2L))
    assert(bands(1L) != bands(3L))
  }

  test("simhash64: hamming tracks similarity") {
    val base = (1 to 100).map(i => s"tok$i")
    val near = base.updated(5, "CHANGED")
    val far = (1 to 100).map(i => s"other$i")
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("id", "t")
    val sigs = df.select($"id", simhash64($"t").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(1L), sigs(2L)) == 0)
    assert(ham(sigs(1L), sigs(3L)) < 16, "one changed token of 100 → small hamming")
    assert(ham(sigs(1L), sigs(4L)) > 16, "disjoint vocab → large hamming")
  }

  test("cosineSim: known vectors") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f)),   // orthogonal → 0
      (Seq(1f, 1f), Seq(2f, 2f)),   // parallel → 1
      (Seq(1f, 0f), Seq(-1f, 0f)),  // opposite → -1
    ).toDF("a", "b")
    val got = df.select(cosineSim($"a", $"b")).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 0.0) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
    // length mismatch → null
    val bad = Seq((Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("a", "b")
      .select(cosineSim($"a", $"b")).head
    assert(bad.isNullAt(0))
  }

  test("winnow64: equal texts equal, different texts differ, deterministic") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "an entirely different sentence about spark engines"),
      (4L, "ab")).toDF("id", "t") // shorter than k → 0
    val fps = df.select($"id", winnow64($"t", 5, 8).as("f")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
    assert(fps(4L) == 0L)
  }

  test("bitInterleave: known mortons, locality, codegen/interpreted parity") {
    import graft.functions.{BitInterleave, PortableMath}
    // hand-checked 4-bit mortons: a=0b1010, b=0b0101 → alternating bits
    val df = Seq((0b1010, 0b0101), (0, 0), (15, 15), (255, 255))
      .toDF("a", "b")
    val got = df.select(PortableMath.zValue($"a", $"b", 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0b10011001L, 0L, 0b11111111L, 0xFFFFL))
    // interpreted path agrees
    import org.apache.spark.sql.catalyst.expressions.Literal
    val interp = Seq((0b1010, 0b0101), (255, 255)).map { case (a, b) =>
      BitInterleave(Literal(a), Literal(b), 8).eval(null)
    }
    assert(interp == Seq(0b10011001L, 0xFFFFL))
    // locality: adjacent bucket pairs differ less in z than distant ones
    val z = (a: Int, b: Int) =>
      BitInterleave(Literal(a), Literal(b), 8).eval(null).asInstanceOf[Long]
    assert(math.abs(z(10, 10) - z(10, 11)) < math.abs(z(10, 10) - z(10, 200)))
  }

  test("windowHashes: rolling equals direct, codepoint-indexed, equality law") {
    // reference: hash every window afresh (O(n·L)) with the same
    // polynomial + finalizer — the rolling recurrence must match it
    // exactly on every position
    def direct(s: String, w: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      if (cps.length < w) Seq.empty
      else (0 to cps.length - w).map { i =>
        var h = 0L
        for (j <- i until i + w) h = h * 0x100000001b3L + cps(j)
        graft.functions.HashUtil.splitmix64(h)
      }
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running home",
      "short",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // periodic content
      "prefix 😀 emoji body with enough padding chars after it!") // non-BMP
    val got = texts.toDF("t").select(windowHashes($"t", 8)).collect()
      .map(_.getSeq[Long](0).toSeq)
    for ((t, g) <- texts.zip(got)) {
      assert(g == direct(t, 8), s"rolling != direct for: $t")
      val n = t.codePoints().toArray.length
      assert(g.length == math.max(0, n - 8 + 1),
        s"length law broken for: $t (cp=$n got=${g.length})")
    }
    // equal substrings hash equal at the right offsets: the fox sentence
    // vs a shifted copy sharing its tail
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "XYZ quick brown fox jumps over the lazy dog"
    val Seq(ha, hb) = Seq(a, b).toDF("t").select(windowHashes($"t", 8))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    // positions ≥ 4 (past the differing prefix) coincide, position 0 differs
    assert(ha.drop(4) == hb.drop(4) && ha.head != hb.head)
  }

  test("nearestCells: zero-norm vector falls back deterministically, no crash") {
    // all cell scores are -inf for a zero vector; selection must fall back
    // to the first unused index rather than index -1 (ADVICE r2)
    val cb = Seq(Seq(1f, 0f), Seq(0f, 1f), Seq(1f, 1f))
    val df = Seq((1L, Seq(0f, 0f)), (2L, Seq(3f, 1f)), (3L, Seq.empty[Float]))
      .toDF("id", "v")
    val rows = df.select($"id", nearestCells($"v", cb, 2).as("c")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(rows(1L) == Seq(0, 1), "zero vector takes cells in index order")
    assert(rows(3L) == Seq(0, 1), "empty vector takes cells in index order")
    assert(rows(2L).head == 0, "real vector still picks true argmax first")
  }

  test("rhSignature: deterministic; similar vectors share more bits") {
    val v = (1 to 64).map(i => math.sin(i.toDouble).toFloat)
    val near = v.updated(0, v(0) + 0.01f)
    val anti = v.map(x => -x)
    val df = Seq((1L, v), (2L, v), (3L, near), (4L, anti)).toDF("id", "v")
    val sigs = df.select($"id", rhSignature($"v", 32, 64).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sigs(1L) == sigs(2L))
    assert(ham(sigs(1L), sigs(3L)) <= 2)
    assert(ham(sigs(1L), sigs(4L)) == 32, "antipodal vector flips every plane")
  }
}
