package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{CosineSim, MinHashes, SimHash64, Winnow64}
import org.apache.spark.sql.catalyst.expressions.Literal

/** Exact algebraic properties of the custom sketch expressions, evaluated
  * directly at the catalyst eval level (no Spark jobs → thousands of
  * trials are cheap). SURVEY.md §5 step 3.
  */
object SketchProps extends Properties("sketches") {

  private def utf8Array(xs: Seq[String]): GenericArrayData =
    new GenericArrayData(xs.map(s => UTF8String.fromString(s)).toArray[Any])
  private def floatArray(xs: Seq[Float]): GenericArrayData =
    new GenericArrayData(xs.toArray[Any])

  private val mh = MinHashes(Literal(null), 64)
  private val sh = SimHash64(Literal(null))
  private val cs = CosineSim(Literal(null), Literal(null))

  private def minhash(xs: Seq[String]): Seq[Long] =
    mh.nullSafeEval(utf8Array(xs)).asInstanceOf[GenericArrayData]
      .toLongArray().toSeq
  private def simhash(xs: Seq[String]): Long =
    sh.nullSafeEval(utf8Array(xs)).asInstanceOf[Long]
  private def cosine(a: Seq[Float], b: Seq[Float]): Any =
    cs.nullSafeEval(floatArray(a), floatArray(b))

  private val tokens: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf((1 to 40).map(i => s"tok$i")))

  property("minhash of a union is the element-wise min") = forAll(tokens, tokens) {
    (a, b) =>
      val u = minhash(a ++ b)
      val (ma, mb) = (minhash(a), minhash(b))
      u == ma.zip(mb).map { case (x, y) => math.min(x, y) }
  }

  property("minhash is order- and duplicate-insensitive") = forAll(tokens) { a =>
    minhash(a) == minhash(scala.util.Random.shuffle(a ++ a))
  }

  property("identical sets → identical signatures; agreement ≤ k") =
    forAll(tokens) { a => minhash(a) == minhash(a) }

  property("simhash is permutation-invariant") = forAll(tokens) { a =>
    simhash(a) == simhash(scala.util.Random.shuffle(a))
  }

  private val vec: Gen[List[Float]] =
    Gen.listOfN(16, Gen.choose(-5.0f, 5.0f)).suchThat(_.exists(_ != 0f))

  property("cosine is symmetric") = forAll(vec, vec) { (a, b) =>
    cosine(a, b) == cosine(b, a)
  }

  property("cosine(a, a) ≈ 1, cosine(a, -a) ≈ -1") = forAll(vec) { a =>
    val self = cosine(a, a).asInstanceOf[Double]
    val anti = cosine(a, a.map(-_)).asInstanceOf[Double]
    math.abs(self - 1.0) < 1e-9 && math.abs(anti + 1.0) < 1e-9
  }

  property("cosine scale-invariant for positive scaling") = forAll(vec) { a =>
    val scaled = a.map(_ * 4.0f) // ×4 is exact in float
    val c1 = cosine(a, scaled).asInstanceOf[Double]
    math.abs(c1 - 1.0) < 1e-9
  }

  private val text: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  property("winnow64 is deterministic; disjoint alphabets never collide to equal sets") =
    forAll(text) { a =>
      val w = Winnow64(Literal(null), 5, 8)
      def fp(s: String) = w.nullSafeEval(UTF8String.fromString(s))
      fp(a) == fp(a) && fp(a + "xxxxxxxxxx") != fp(a + "yyyyyyyyyy")
    }

  private val bucket: Gen[Int] = Gen.choose(0, 255)

  property("bitInterleave is a bijection on 8-bit pairs (deinterleave inverts)") =
    forAll(bucket, bucket) { (a, b) =>
      val z = graft.functions.BitInterleave(Literal(a), Literal(b), 8)
        .eval(null).asInstanceOf[Long]
      def deinterleave(z: Long, odd: Boolean): Int = {
        var v = 0; var k = 0
        while (k < 8) {
          val pos = 2 * k + (if (odd) 1 else 0)
          if (((z >> pos) & 1L) == 1L) v |= (1 << k)
          k += 1
        }
        v
      }
      z >= 0 && z < 65536 &&
        deinterleave(z, odd = true) == a && deinterleave(z, odd = false) == b
    }
}
