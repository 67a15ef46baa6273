package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** Optimizer rule: un-wrap `to_date(ts) <cmp> date-literal` predicates into
  * half-open raw-timestamp ranges.
  *
  * Both reference filters wrap the scanned column in `to_date(...)`
  * (`calculate_daily_transactions.py:54-55`,
  * `calculate_top_taxi_zones.py:31`), which defeats parquet row-group
  * pushdown and partition pruning — the scan reads everything and filters
  * per-row (SURVEY.md §4). Rewriting to a raw range restores pushdown:
  *
  *   to_date(ts) =  d  →  ts >= d₀₀:₀₀ AND ts < (d+1)₀₀:₀₀
  *   to_date(ts) <= d  →  ts < (d+1)₀₀:₀₀
  *   to_date(ts) <  d  →  ts < d₀₀:₀₀
  *   to_date(ts) >= d  →  ts >= d₀₀:₀₀
  *   to_date(ts) >  d  →  ts >= (d+1)₀₀:₀₀
  *
  * Null semantics are preserved: `ts IS NULL` makes both forms evaluate to
  * null → row filtered. Applied only under a UTC cast (the project pins
  * `spark.sql.session.timeZone=UTC`); other zones shift the day boundary
  * and are left untouched — conservative over clever.
  *
  * `to_date(c)` analyzes to `Cast(c, DateType)`, so the match is on Cast.
  */
object RewriteToDatePredicates extends Rule[LogicalPlan] {
  private val utcNames = Set("UTC", "Etc/UTC", "Z", "GMT", "+00:00")

  private def tsLit(days: Int): Literal =
    Literal(days.toLong * 86400L * 1000000L, TimestampType)

  private object TsToDate {
    def unapply(e: Expression): Option[Expression] = e match {
      case c @ Cast(ts, DateType, tz, _)
          if ts.dataType == TimestampType && ts.deterministic &&
            tz.forall(utcNames.contains) && c.timeZoneId.forall(utcNames.contains) =>
        Some(ts)
      case _ => None
    }
  }

  private object DateLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(days: Int, DateType) => Some(days)
      case _ => None
    }
  }

  /** `timestamp_micros(x div 1000)` over a raw long column — the engine's
    * own parquet-NANOS workaround (graft.Tables). Predicates on this
    * derived column block pushdown to the underlying long; rewriting them
    * onto `x` (in nanos) restores row-group pruning. */
  private object NanoTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(x, Literal(1000L, _), _))
          if x.dataType == org.apache.spark.sql.types.LongType && x.deterministic =>
        Some(x)
      case _ => None
    }
  }

  /** `CAST(x AS TIMESTAMP)` over a TIMESTAMP_NTZ column — the engine's
    * normalization of the micros-NTZ corpus generation (graft.Tables).
    * Under a UTC session the cast is the identity on the µs payload, so a
    * predicate on the cast is exactly a predicate on the raw column with
    * the literal re-typed — which the parquet scan can push down. */
  private object NtzTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case c @ Cast(x, TimestampType, tz, _)
          if x.dataType == TimestampNTZType && x.deterministic &&
            tz.forall(utcNames.contains) && c.timeZoneId.forall(utcNames.contains) =>
        Some(x)
      case _ => None
    }
  }

  private object TsLit {
    private val max = Long.MaxValue / 1000 - 2
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(us: Long, TimestampType) if math.abs(us) < max => Some(us)
      case _ => None
    }
  }

  /** Smallest nano value x with `x div 1000 >= v`, under IntegralDivide's
    * truncate-toward-zero semantics (NOT floor): for v <= 0 any x down to
    * v*1000 - 999 still truncates up to v (e.g. -1500 div 1000 = -1). */
  private def nanoBound(v: Long): Literal =
    Literal(if (v > 0) v * 1000L else v * 1000L - 999L,
      org.apache.spark.sql.types.LongType)

  private def rewrite(e: Expression): Expression = e.transformUp {
    case EqualTo(TsToDate(ts), DateLit(d)) =>
      And(GreaterThanOrEqual(ts, tsLit(d)), LessThan(ts, tsLit(d + 1)))
    case EqualTo(DateLit(d), TsToDate(ts)) =>
      And(GreaterThanOrEqual(ts, tsLit(d)), LessThan(ts, tsLit(d + 1)))
    case LessThanOrEqual(TsToDate(ts), DateLit(d)) => LessThan(ts, tsLit(d + 1))
    case LessThan(TsToDate(ts), DateLit(d)) => LessThan(ts, tsLit(d))
    case GreaterThanOrEqual(TsToDate(ts), DateLit(d)) => GreaterThanOrEqual(ts, tsLit(d))
    case GreaterThan(TsToDate(ts), DateLit(d)) => GreaterThanOrEqual(ts, tsLit(d + 1))
    // literal-on-the-left comparisons, mirrored
    case LessThanOrEqual(DateLit(d), TsToDate(ts)) => GreaterThanOrEqual(ts, tsLit(d))
    case LessThan(DateLit(d), TsToDate(ts)) => GreaterThanOrEqual(ts, tsLit(d + 1))
    case GreaterThanOrEqual(DateLit(d), TsToDate(ts)) => LessThan(ts, tsLit(d + 1))
    case GreaterThan(DateLit(d), TsToDate(ts)) => LessThan(ts, tsLit(d))
    // ns→µs conversion pushdown (x in nanos, literal in micros). With
    // q = x div 1000 (truncate toward zero):  q >= u ⟺ x >= nanoBound(u),
    // q > u ⟺ q >= u+1, q < u ⟺ x < nanoBound(u), q <= u ⟺ x < nanoBound(u+1).
    case GreaterThanOrEqual(NanoTs(x), TsLit(u)) => GreaterThanOrEqual(x, nanoBound(u))
    case GreaterThan(NanoTs(x), TsLit(u)) => GreaterThanOrEqual(x, nanoBound(u + 1))
    case LessThan(NanoTs(x), TsLit(u)) => LessThan(x, nanoBound(u))
    case LessThanOrEqual(NanoTs(x), TsLit(u)) => LessThan(x, nanoBound(u + 1))
    case EqualTo(NanoTs(x), TsLit(u)) =>
      And(GreaterThanOrEqual(x, nanoBound(u)), LessThan(x, nanoBound(u + 1)))
    case EqualTo(TsLit(u), NanoTs(x)) =>
      And(GreaterThanOrEqual(x, nanoBound(u)), LessThan(x, nanoBound(u + 1)))
    case GreaterThanOrEqual(TsLit(u), NanoTs(x)) => LessThan(x, nanoBound(u + 1))
    case GreaterThan(TsLit(u), NanoTs(x)) => LessThan(x, nanoBound(u))
    case LessThan(TsLit(u), NanoTs(x)) => GreaterThanOrEqual(x, nanoBound(u + 1))
    case LessThanOrEqual(TsLit(u), NanoTs(x)) => GreaterThanOrEqual(x, nanoBound(u))
    // NTZ-cast unwrap (UTC only: µs payload identical on both sides).
    // Runs to fixpoint with the to_date cases above, so
    // `to_date(cast(ntz AS ts)) = d` lowers to a raw NTZ range in two steps.
    case b: BinaryComparison => (b.left, b.right) match {
      case (NtzTs(x), TsLit(u)) =>
        b.withNewChildren(Seq(x, Literal(u, TimestampNTZType)))
      case (TsLit(u), NtzTs(x)) =>
        b.withNewChildren(Seq(Literal(u, TimestampNTZType), x))
      case _ => b
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) => f.copy(condition = rewrite(cond))
  }
}

/** `SparkSessionExtensions` hook:
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteToDatePredicates)
    e.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    graft.functions.SqlFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.SqlFunctions", name),
        b))
    }
  }
}
