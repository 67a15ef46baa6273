package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableMath

/** Duplicate-key discipline of the sparse-dot expressions (r15, ADVICE):
  * a duplicate key inside one vector is an in-doc hash collision and must
  * fail LOUDLY on every path — the old map form threw at
  * map_from_entries construction for every pair, so the merge forms may
  * not silently skip a term (fast: an underestimated prefilter dot could
  * drop a qualifying pair below the t − 1e-4 gate before the exact dot
  * ever sees it; exact: tail keys after one side exhausts still carried
  * the guarantee). */
class SparseDotSpec extends SparkSpec {

  private def vec(entries: (Long, Double)*) =
    array(entries.map { case (h, w) =>
      struct(lit(h).as("h"), lit(w).as("w")) }: _*)

  private def evalDot(fast: Boolean, a: Seq[(Long, Double)],
                      b: Seq[(Long, Double)]): Double = {
    val d = if (fast) PortableMath.sparseDotFast(vec(a: _*), vec(b: _*))
            else PortableMath.sparseDotExact(vec(a: _*), vec(b: _*))
    spark.range(1).select(d.as("d")).collect()(0).getDouble(0)
  }

  test("exact and fast agree on clean sorted vectors") {
    val a = Seq(1L -> 0.5, 3L -> 0.25, 9L -> 0.5)
    val b = Seq(3L -> 0.4, 8L -> 0.1, 9L -> 0.2)
    val expect = 0.25 * 0.4 + 0.5 * 0.2
    assert(math.abs(evalDot(fast = false, a, b) - expect) < 1e-9)
    assert(math.abs(evalDot(fast = true, a, b) - expect) < 1e-9)
    // empty side: zero, no throw
    assert(evalDot(fast = true, Seq.empty, b) == 0.0)
    assert(evalDot(fast = false, a, Seq.empty) == 0.0)
  }

  test("duplicate keys throw loudly on both forms, including tails") {
    def boom(fast: Boolean, a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Unit = {
      val e = intercept[Exception] { evalDot(fast, a, b) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("duplicate key")), e.toString)
    }
    val clean = Seq(1L -> 0.1, 2L -> 0.2)
    val dupHead = Seq(1L -> 0.1, 1L -> 0.2, 5L -> 0.3)
    // duplicate hit while both pointers are live
    boom(fast = true, dupHead, clean)
    boom(fast = false, dupHead, clean)
    boom(fast = true, clean, dupHead)
    boom(fast = false, clean, dupHead)
    // duplicate entirely in the TAIL after the other side is exhausted —
    // the partial-coverage hole the r14 ADVICE called out
    val dupTail = Seq(1L -> 0.1, 7L -> 0.2, 7L -> 0.3)
    val short = Seq(1L -> 0.5)
    boom(fast = true, dupTail, short)
    boom(fast = false, dupTail, short)
    boom(fast = true, short, dupTail)
    boom(fast = false, short, dupTail)
  }
}
