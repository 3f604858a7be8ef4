package graft.plans

import java.time.{LocalDateTime, ZoneId, ZoneOffset}

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

  /** year()/quarter() over TimestampType evaluate in the SESSION timezone
    * (the analyzer's Cast(ts, DateType) is zone-aware), so quarter
    * boundaries must be converted to instants in that same zone — a
    * hardcoded UTC would silently shift rows near boundaries for non-UTC
    * sessions. TimestampNTZ and Date are wall-clock types: zone-free.
    */
  private def micros(d: LocalDateTime, dt: DataType): Long = {
    val zone = dt match {
      case TimestampType =>
        ZoneId.of(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
      case _ => ZoneOffset.UTC
    }
    val inst = d.atZone(zone).toInstant
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  private def boundsFor(t: Expression, year: Int, quarter: Int): Option[Expression] = {
    val start = LocalDateTime.of(year, (quarter - 1) * 3 + 1, 1, 0, 0)
    val end = start.plusMonths(3)
    val (lo, hi) = t.dataType match {
      case TimestampNTZType | TimestampType =>
        (Literal(micros(start, t.dataType), t.dataType),
          Literal(micros(end, t.dataType), t.dataType))
      case DateType =>
        (Literal(start.toLocalDate.toEpochDay.toInt, DateType),
          Literal(end.toLocalDate.toEpochDay.toInt, DateType))
      case _ => return None
    }
    Some(And(GreaterThanOrEqual(t, lo), LessThan(t, hi)))
  }

  private def parse(lit: UTF8String): Option[(Int, Int)] = lit.toString match {
    case QuarterLit(y, q) if y.toInt >= 1000 => Some((y.toInt, q.toInt))
    case _ => None
  }

  private def rewrite(t: Expression, lit: UTF8String): Option[Expression] =
    parse(lit).flatMap { case (y, q) => boundsFor(t, y, q) }

  /** One-sided bound: quarter start (inclusive side) or quarter end
    * (exclusive side).
    *
    * DATA CONTRACT (ordered comparisons only): data-side years must be
    * 4-digit, i.e. in [1000, 9999] — the same window the literal parse
    * enforces. Only there does "YYYY-Qn" string order equal chronological
    * order. A 5-digit data year compares lexicographically by prefix
    * ("10000-Q1" < "1996-Q2" but "25000-Q1" > "1996-Q2"), so no range form
    * is exact for it, and <1000 years (non-zero-padded) are prefix-
    * dependent too. Equality and IN rewrites are exact for ALL data years:
    * out-of-window years can never string-equal a 4-digit literal, and the
    * rewritten range only admits rows inside the literal's quarter.
    */
  private def bound(t: Expression, y: Int, q: Int, fromStart: Boolean): Option[Expression] = {
    val start = LocalDateTime.of(y, (q - 1) * 3 + 1, 1, 0, 0)
    val point = if (fromStart) start else start.plusMonths(3)
    t.dataType match {
      case TimestampNTZType | TimestampType =>
        Some(Literal(micros(point, t.dataType), t.dataType))
      case DateType => Some(Literal(point.toLocalDate.toEpochDay.toInt, DateType))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case eq @ EqualTo(QuarterKey(t), Literal(s: UTF8String, StringType)) =>
      rewrite(t, s).getOrElse(eq)
    case eq @ EqualTo(Literal(s: UTF8String, StringType), QuarterKey(t)) =>
      rewrite(t, s).getOrElse(eq)
    // quarter IN (...) -> OR of ranges, if every literal is well-formed
    case in @ In(QuarterKey(t), list) if list.nonEmpty && list.forall {
        case Literal(s: UTF8String, StringType) => parse(s).isDefined
        case _ => false
      } =>
      val ranges = list.flatMap { case Literal(s: UTF8String, StringType) =>
        rewrite(t, s)
      }
      if (ranges.size == list.size) ranges.reduce(Or) else in
    // Ordered comparisons: string order == chronological order under the
    // 4-digit data-year contract (see bound's scaladoc).
    case c @ GreaterThanOrEqual(QuarterKey(t), Literal(s: UTF8String, StringType)) =>
      parse(s).flatMap { case (y, q) =>
        bound(t, y, q, fromStart = true).map(GreaterThanOrEqual(t, _))
      }.getOrElse(c)
    case c @ GreaterThan(QuarterKey(t), Literal(s: UTF8String, StringType)) =>
      parse(s).flatMap { case (y, q) =>
        bound(t, y, q, fromStart = false).map(GreaterThanOrEqual(t, _))
      }.getOrElse(c)
    case c @ LessThan(QuarterKey(t), Literal(s: UTF8String, StringType)) =>
      parse(s).flatMap { case (y, q) =>
        bound(t, y, q, fromStart = true).map(LessThan(t, _))
      }.getOrElse(c)
    case c @ LessThanOrEqual(QuarterKey(t), Literal(s: UTF8String, StringType)) =>
      parse(s).flatMap { case (y, q) =>
        bound(t, y, q, fromStart = false).map(LessThan(t, _))
      }.getOrElse(c)
  }

  /** Install on a live session (experimental extra optimizations). */
  def install(s: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    val cur = castToImpl(s).experimental.extraOptimizations
    if (!cur.contains(this)) castToImpl(s).experimental.extraOptimizations = cur :+ this
  }
}

/** Builder-time injection: `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. Carries the WHOLE
  * library surface a SQL-only user needs: the optimizer rule plus every
  * [[graft.functions.GraftFunctions]] entry — injected functions land in
  * each session state built on the context (including `newSession()`
  * clones), so no Scala-side `register` call is ever required.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => QuarterKeyPushdown)
    graft.functions.GraftFunctions.all.foreach { case (name, cls, builder) =>
      e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(cls, name),
        builder))
    }
  }
}
