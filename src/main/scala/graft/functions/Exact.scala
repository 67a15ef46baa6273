package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers for oracle-exact floating-point aggregation.
  *
  * Summing doubles is order-dependent, and Spark's partial/final aggregation
  * order differs run-to-run and engine-to-engine — so any `sum(double)` the
  * driver hash-compares against DuckDB is a flaky mismatch. Routing the
  * values through fixed-scale decimals makes the sum exact and
  * order-independent in both engines; the final cast back to double then
  * yields bit-identical results. Same trick on the DuckDB side:
  * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
  *
  * At scale this costs one decimal widening per row in the aggregate —
  * negligible next to the shuffle — and buys deterministic, reproducible
  * aggregates, which a 1000-executor job wants anyway.
  */
object Exact {
  /** Money-ish column (2 decimal places in the corpus). */
  def money(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Rate-ish column (discount/tax, 2 decimal places). */
  def rate(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact order-independent sum of a 2-decimal double, returned as double. */
  def sumMoney(c: Column): Column = sum(money(c)).cast("double")

  /** Exact average of a 2-decimal double: decimal sum / count, in double. */
  def avgMoney(c: Column): Column =
    (sum(money(c)).cast("double") / count(c)).cast("double")
}
