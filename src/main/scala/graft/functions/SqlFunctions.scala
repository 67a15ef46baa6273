package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** SQL-surface registration of the engine's custom catalyst expressions.
  *
  * A user who speaks only `spark.sql(...)` gets the same codegen'd
  * expressions as the column API — `SELECT graft_simhash64(split(text,' '))
  * FROM docs` plans identically to `Sketches.simhash64(...)`. Shape
  * parameters (band width, shingle size, bits) must be integer literals:
  * they parameterize the expression tree itself, exactly like the column
  * API's constructor arguments.
  *
  * Two wiring paths, same builders: [[register]] for an existing session
  * (used by the SQL queries), `GraftExtensions.injectFunction` for
  * config-based wiring (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
object SqlFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an INTEGER literal, got $other")
  }

  /** name → (arity for the doc string, expression builder). */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_ln" -> ((args: Seq[Expression]) =>
      PortableLn(Cast(args.head, DoubleType))),
    "graft_bit_interleave" -> ((args: Seq[Expression]) =>
      BitInterleave(Cast(args(0), IntegerType), Cast(args(1), IntegerType),
        intLit(args(2), "bits"))),
    "graft_simhash64" -> ((args: Seq[Expression]) => SimHash64(args.head)),
    "graft_shingle_simhash64" -> ((args: Seq[Expression]) =>
      ShingleSimHash64(args(0), intLit(args(1), "shingle size n"))),
    "graft_minhashes" -> ((args: Seq[Expression]) =>
      MinHashes(args(0), intLit(args(1), "signature size k"))),
    "graft_shingle_minhashes" -> ((args: Seq[Expression]) =>
      ShingleMinHashes(args(0), intLit(args(1), "shingle size n"),
        intLit(args(2), "signature size k"))),
    "graft_band_hashes" -> ((args: Seq[Expression]) =>
      BandHashes(args(0), intLit(args(1), "rows per band r"))),
    "graft_cosine_sim" -> ((args: Seq[Expression]) =>
      CosineSim(args(0), args(1))),
    "graft_winnow64" -> ((args: Seq[Expression]) =>
      Winnow64(args(0), intLit(args(1), "k-gram size"),
        intLit(args(2), "window size"))),
    "graft_jaccard_shingles" -> ((args: Seq[Expression]) =>
      JaccardShingles(args(0), args(1), intLit(args(2), "shingle size n"))),
    "graft_id_pairs" -> ((args: Seq[Expression]) =>
      IdPairs(args.head)),
    "graft_hamming_pairs" -> ((args: Seq[Expression]) =>
      HammingPairs(args(0), intLit(args(1), "max hamming distance"))),
    "graft_cdc_chunks" -> ((args: Seq[Expression]) =>
      CdcChunks(args(0), intLit(args(1), "min chunk length"),
        intLit(args(2), "boundary mask bits"),
        intLit(args(3), "max chunk length"))),
  )

  /** Register every builder on `spark` (idempotent; session-scoped). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftBridge.registerFunction(spark, name, b)
    }
}
