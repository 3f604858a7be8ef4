package graft.plans

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst optimizer rule for the engine's central idiom: the derived
  * quarter key `concat(year(ts), '-Q', quarter(ts))` (Scalar.toQuarter —
  * the reference's universal join/filter key, src/ETL-NPL-Pipeline.py:350).
  *
  * A filter on a derived string column can never reach the parquet scan —
  * the scan sees an opaque Concat. This rule rewrites
  *
  *   toQuarter(ts) = 'YYYY-Qn'   ==>   ts >= qStart AND ts < qEnd
  *
  * which IS pushable: row-group min/max stats on the raw timestamp column
  * then skip everything outside the quarter. On a 100 TB time-partitioned
  * fact table that is the difference between a full scan and touching one
  * quarter's files.
  *
  * Semantics: exact for years >= 1000 (4-digit year ⇔ the concat string
  * matches the literal pattern); other literals are left untouched. Null
  * timestamps filter out in both forms.
  */
object QuarterKeyPushdown extends Rule[LogicalPlan] {

  /** Cast-to-string with any ansi/timezone flavor. */
  private object StrCast {
    def unapply(e: Expression): Option[Expression] = e match {
      case c: Cast if c.dataType == StringType => Some(c.child)
      case _ => None
    }
  }

  /** The date-typed operand beneath year()/quarter(): either a date column
    * or an implicit Cast(ts, DateType) the analyzer inserted.
    */
  private object AsDate {
    def unapply(e: Expression): Option[Expression] = e match {
      case c: Cast if c.dataType == DateType => Some(c.child)
      case d if d.dataType == DateType => Some(d)
      case _ => None
    }
  }

  /** Matches the analyzed toQuarter(ts) tree and yields the raw ts expr. */
  private object QuarterKey {
    def unapply(e: Expression): Option[Expression] = e match {
      case Concat(Seq(StrCast(Year(AsDate(a))), Literal(dash: UTF8String, StringType),
          StrCast(Quarter(AsDate(b)))))
        if dash.toString == "-Q" && a.semanticEquals(b) => Some(a)
      case _ => None
    }
  }

  private val QuarterLit = "^(\\d{4})-Q([1-4])$".r

  private def boundsFor(t: Expression, year: Int, quarter: Int): Option[Expression] = {
    val start = LocalDateTime.of(year, (quarter - 1) * 3 + 1, 1, 0, 0)
    val end = start.plusMonths(3)
    def micros(d: LocalDateTime) = d.toInstant(ZoneOffset.UTC).getEpochSecond * 1000000L
    val (lo, hi) = t.dataType match {
      case TimestampNTZType | TimestampType =>
        (Literal(micros(start), t.dataType), Literal(micros(end), t.dataType))
      case DateType =>
        (Literal(start.toLocalDate.toEpochDay.toInt, DateType),
          Literal(end.toLocalDate.toEpochDay.toInt, DateType))
      case _ => return None
    }
    Some(And(GreaterThanOrEqual(t, lo), LessThan(t, hi)))
  }

  private def rewrite(t: Expression, lit: UTF8String): Option[Expression] =
    lit.toString match {
      case QuarterLit(y, q) if y.toInt >= 1000 => boundsFor(t, y.toInt, q.toInt)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case eq @ EqualTo(QuarterKey(t), Literal(s: UTF8String, StringType)) =>
      rewrite(t, s).getOrElse(eq)
    case eq @ EqualTo(Literal(s: UTF8String, StringType), QuarterKey(t)) =>
      rewrite(t, s).getOrElse(eq)
  }

  /** Install on a live session (experimental extra optimizations). */
  def install(s: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    val cur = castToImpl(s).experimental.extraOptimizations
    if (!cur.contains(this)) castToImpl(s).experimental.extraOptimizations = cur :+ this
  }
}

/** Builder-time injection: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => QuarterKeyPushdown)
}
