package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL surface for the native as-of join — the `ASOF JOIN` / `ASOF LEFT
  * JOIN` syntax DuckDB users write (and this repo's own oracle SQL uses,
  * see SparkEntry.oracleSql "asof_join"), planned onto AsofJoinExec.
  *
  * Spark's ANTLR grammar is not extensible in-place, so the parser wraps
  * the session parser (injectParser) and does a SYNTAX-level pass only:
  * strip the `ASOF` keyword (outside string literals), let the stock
  * parser build the Join, then swap each as-of-shaped Join for an
  * [[UnresolvedAsofJoin]] marker. SEMANTIC work — resolving which side of
  * the condition is which, fresh-aliasing the right side for self-joins
  * (DeduplicateRelations does not visit custom nodes), picking the sweep
  * direction — happens after analysis resolves the children, in
  * [[ResolveAsofJoin]] (injectResolutionRule). Both are wired by
  * GraftExtensions.
  *
  * Supported condition shape (DuckDB's): exactly one key equality plus
  * one non-strict timestamp inequality, `l.ts >= r.ts` (backward) or
  * `l.ts <= r.ts` (forward), either operand order. Contract limits,
  * enforced loudly: every as-of-shaped join in a query containing ASOF
  * must come from an ASOF token (a plain inequality join mixed into the
  * same statement is rejected rather than silently converted), key
  * columns must share a name (the physical operator's contract), and
  * strict `<`/`>` is rejected (the engine matches at-or-before /
  * at-or-after).
  */
object AsofSql {

  private val AsofToken =
    """(?i)\bASOF\s+(?=(LEFT\s+(OUTER\s+)?|INNER\s+)?JOIN\b)""".r

  def countAsof(sql: String): Int = {
    var n = 0
    mapOutsideLiterals(sql, seg => { n += AsofToken.findAllIn(seg).size; seg })
    n
  }

  /** Strip ASOF keywords, leaving a statement the stock parser accepts. */
  def stripAsof(sql: String): String =
    mapOutsideLiterals(sql, seg => AsofToken.replaceAllIn(seg, ""))

  /** Apply `f` to every segment of `sql` outside '…'/"…"/`…` literals, so
    * a string VALUE containing "ASOF JOIN" is never rewritten.
    */
  private def mapOutsideLiterals(sql: String, f: String => String): String = {
    val out = new StringBuilder
    val seg = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < sql.length) {
      val ch = sql.charAt(i)
      if (quote == 0) {
        if (ch == '\'' || ch == '"' || ch == '`') {
          out.append(f(seg.toString)); seg.clear(); quote = ch; out.append(ch)
        } else seg.append(ch)
      } else {
        out.append(ch)
        // a doubled quote ('') reads as close+reopen — harmless here
        if (ch == quote) quote = 0
      }
      i += 1
    }
    out.append(f(seg.toString))
    out.toString
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def isColumn(e: Expression): Boolean = e match {
    case _: UnresolvedAttribute | _: AttributeReference => true
    case _ => false
  }

  /** One column equality + one column inequality — the only join shape the
    * ASOF syntax can produce, used both to find the joins to convert and
    * to reject ambiguous statements.
    */
  private def isAsofShape(cond: Expression): Boolean =
    conjuncts(cond) match {
      case Seq(a, b) =>
        val (eqs, ineqs) = (Seq(a, b).partition {
          case EqualTo(x, y) => isColumn(x) && isColumn(y)
          case _ => false
        })
        eqs.size == 1 && (ineqs.head match {
          case GreaterThanOrEqual(x, y) => isColumn(x) && isColumn(y)
          case LessThanOrEqual(x, y)    => isColumn(x) && isColumn(y)
          case GreaterThan(x, y)        => isColumn(x) && isColumn(y)
          case LessThan(x, y)           => isColumn(x) && isColumn(y)
          case _ => false
        })
      case _ => false
    }

  /** Swap every as-of-shaped Join for the marker; the count must equal the
    * number of ASOF tokens or the statement is ambiguous.
    */
  def convert(parsed: LogicalPlan, asofCount: Int, sql: String): LogicalPlan = {
    var converted = 0
    val out = parsed.transformUp {
      case Join(l, r, jt, Some(cond), _)
          if (jt == Inner || jt == LeftOuter) && isAsofShape(cond) =>
        converted += 1
        UnresolvedAsofJoin(l, r, cond, jt == LeftOuter)
    }
    if (converted != asofCount)
      throw new IllegalArgumentException(
        s"""ASOF JOIN surface: found $asofCount ASOF token(s) but $converted
           |convertible join(s). Every join in a statement containing ASOF must
           |be distinguishable: an ASOF join needs exactly one same-named key
           |equality AND one timestamp inequality (l.ts >= r.ts backward,
           |l.ts <= r.ts forward); a NON-asof join in the same statement must
           |not have that exact shape. Statement: $sql""".stripMargin)
    out
  }
}

/** Parse-time marker for an `ASOF [LEFT] JOIN`; [[ResolveAsofJoin]]
  * replaces it with the real AsofJoinNode once both children resolve.
  * Unresolvable by construction so an un-converted marker fails analysis
  * instead of silently mis-planning.
  */
case class UnresolvedAsofJoin(left: LogicalPlan, right: LogicalPlan,
                              condition: Expression, leftOuter: Boolean)
    extends BinaryNode {
  override lazy val resolved: Boolean = false
  override def output: Seq[Attribute] = Nil
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): UnresolvedAsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Analyzer rule: UnresolvedAsofJoin → AsofJoinNode. Runs once the
  * children are resolved, so the condition's columns can be located by
  * qualifier against real outputs, and the right side can be
  * fresh-aliased (qualifiers preserved) to keep self-join exprIds unique.
  */
object ResolveAsofJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case u @ UnresolvedAsofJoin(l, r, cond, leftOuter) if u.childrenResolved =>
      // locate a condition column: (attribute, cameFromLeft)
      def locate(e: Expression): Option[(Attribute, Boolean)] = e match {
        case a: AttributeReference =>
          if (l.outputSet.contains(a)) Some((a, true))
          else if (r.outputSet.contains(a)) Some((a, false))
          else None
        case ua: UnresolvedAttribute =>
          l.resolve(ua.nameParts, conf.resolver)
            .collect { case a: Attribute => (a, true) }
            .orElse(r.resolve(ua.nameParts, conf.resolver)
              .collect { case a: Attribute => (a, false) })
        case _ => None
      }
      def fail(msg: String): Nothing =
        throw new IllegalArgumentException(s"ASOF JOIN surface: $msg")

      var key: String = null
      var leftTs: String = null
      var rightTs: String = null
      var forward = false

      def classifyEq(x: Expression, y: Expression): Unit =
        (locate(x), locate(y)) match {
          case (Some((xa, true)), Some((ya, false))) => classifyEqOk(xa, ya)
          case (Some((xa, false)), Some((ya, true))) => classifyEqOk(ya, xa)
          case _ => fail(s"cannot resolve key equality $x = $y against the join sides")
        }
      def classifyEqOk(la: Attribute, ra: Attribute): Unit = {
        if (la.name != ra.name)
          fail(s"key columns must share a name (got ${la.name} = ${ra.name}); " +
            "alias one side")
        key = la.name
      }
      def classifyIneq(x: Expression, y: Expression, geq: Boolean): Unit =
        (locate(x), locate(y)) match {
          // l.ts >= r.ts → backward; l.ts <= r.ts → forward
          case (Some((xa, true)), Some((ya, false))) =>
            leftTs = xa.name; rightTs = ya.name; forward = !geq
          // r.ts <= l.ts → backward; r.ts >= l.ts → forward
          case (Some((xa, false)), Some((ya, true))) =>
            leftTs = ya.name; rightTs = xa.name; forward = geq
          case _ => fail(s"cannot resolve timestamp inequality against the join sides")
        }

      def walk(e: Expression): Unit = e match {
        case org.apache.spark.sql.catalyst.expressions.And(a, b) => walk(a); walk(b)
        case EqualTo(x, y) => classifyEq(x, y)
        case GreaterThanOrEqual(x, y) => classifyIneq(x, y, geq = true)
        case LessThanOrEqual(x, y) => classifyIneq(x, y, geq = false)
        case _: GreaterThan | _: LessThan =>
          fail("strict </> is not supported — the engine matches at-or-before/" +
            "at-or-after; use >= or <=")
        case other => fail(s"unsupported condition term $other")
      }
      walk(cond)
      if (key == null || leftTs == null) fail(s"incomplete as-of condition $cond")

      // fresh exprIds on the right (self-join safety — DeduplicateRelations
      // skips custom nodes), keeping names AND qualifiers so outer
      // projections like `c.value` still resolve
      val rFresh = Project(
        r.output.map(a => Alias(a, a.name)(qualifier = a.qualifier)), r)
      AsofJoinNode(l, rFresh, key, leftTs, rightTs, prefix = "",
        leftOuter = leftOuter, forward = forward)
  }
}

/** Session parser wrapper: intercepts statements containing ASOF JOIN,
  * delegates everything else untouched.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private def withAsof(sql: String, parse: String => LogicalPlan): LogicalPlan = {
    val n = AsofSql.countAsof(sql)
    if (n == 0) parse(sql)
    else AsofSql.convert(parse(AsofSql.stripAsof(sql)), n, sql)
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    withAsof(sqlText, delegate.parsePlan)
  override def parseQuery(sqlText: String): LogicalPlan =
    withAsof(sqlText, delegate.parseQuery)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
