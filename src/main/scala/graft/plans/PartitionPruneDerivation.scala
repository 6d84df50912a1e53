package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.{DataType, DateType, TimestampType}

/** Derives `__ptk` partition predicates from filters on the partition-key
  * SOURCE column — the Catalyst-native form of the reference's only custom
  * rewrite: its shallow WHERE scan turns comparisons on the partition column
  * into ptk ranges so only matching part files are mmap'd
  * (crates/lang/src/parse.rs:539-893, consumed in
  * crates/engine/src/datafusions.rs:75-105).
  *
  * A graft table `PARTITION BY toYYYYMM(d)` stores parquet under
  * `__ptk=<yyyymm>/` directories. A user query filters on `d`, not `__ptk`,
  * so Spark's partition pruning alone would scan every directory. This rule
  * rewrites `Filter(d <op> lit, scan)` to also constrain `__ptk`:
  *
  *   - `d = v`   → `__ptk = f(v)`          (any deterministic f)
  *   - `d IN (…)`→ `__ptk IN (f(…))`       (any deterministic f)
  *   - `d >= v`  → `__ptk >= f(v)`         (monotone non-decreasing f only)
  *   - `d <= v`  → `__ptk <= f(v)`         (same; strict ops use non-strict
  *                                          bounds since f is a step function)
  *
  * The added conjunct references only the partition column, so Spark's
  * PruneFileSourcePartitions turns it into directory pruning — at 100 TB
  * that is the difference between scanning one month and scanning a decade.
  * The rewrite never changes results: every stored row satisfies
  * `__ptk = f(src)` by construction of the write path.
  */
case class PartitionPruneDerivation(spark: SparkSession) extends Rule[LogicalPlan] {
  private val PtkCol = "__ptk"
  private val PropExpr = "graft.ptk.expr"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: LogicalRelation)
        if rel.catalogTable.exists(_.properties.contains(PropExpr)) &&
          !cond.references.exists(_.name == PtkCol) =>
      (for {
        ptkAttr <- rel.output.find(_.name == PtkCol)
        ptk <- resolvePtkExpr(rel.catalogTable.get.properties(PropExpr), rel.output)
        src <- singleSourceAttr(ptk)
        derived <- deriveConjunct(cond, ptk, src, ptkAttr)
      } yield Filter(And(cond, derived), rel)).getOrElse(f)
  }

  /** Parse + resolve the stored CH partition expression against the scan's
    * output (attribute by name; functions through the session registry,
    * which carries the CH pack).
    */
  private def resolvePtkExpr(exprStr: String,
                             output: Seq[Attribute]): Option[Expression] =
    try {
      val parsed = spark.sessionState.sqlParser.parseExpression(exprStr)
      val resolved = parsed.transformUp {
        case ua: UnresolvedAttribute =>
          output.find(_.name.equalsIgnoreCase(ua.nameParts.last)).getOrElse(return None)
        case uf: UnresolvedFunction =>
          spark.sessionState.functionRegistry.lookupFunction(
            FunctionIdentifier(uf.nameParts.last), uf.arguments)
      }
      // Minimal implicit-cast pass: the analyzer never sees this expression,
      // so date-part functions over a TIMESTAMP source and mixed-width
      // arithmetic (id % 3 → long % int) need the casts added here
      // (TypeCoercion would do both in a full analysis run).
      val coerced = resolved.transformUp {
        // NB: BinaryArithmetic also extends ExpectsInputTypes — this case
        // must come first or the generic case swallows it unchanged.
        case b: BinaryArithmetic
            if b.left.resolved && b.right.resolved &&
              b.left.dataType != b.right.dataType =>
          widen(b.left.dataType, b.right.dataType) match {
            case Some(t) =>
              def up(c: Expression) = if (c.dataType == t) c else Cast(c, t)
              b.withNewChildren(Seq(up(b.left), up(b.right)))
            case None => b
          }
        case e: ExpectsInputTypes if e.children.nonEmpty =>
          val fixed = e.children.zip(e.inputTypes).map {
            case (c, DateType) if c.dataType == TimestampType => Cast(c, DateType)
            case (c, _) => c
          }
          if (fixed == e.children) e else e.withNewChildren(fixed)
      }
      if (coerced.resolved) Some(coerced) else None
    } catch { case _: Exception => None }

  /** Tightest common numeric type (integral/fractional widening only —
    * enough for the reference's arith-over-one-column partition exprs).
    */
  private def widen(a: DataType, b: DataType): Option[DataType] = {
    val order: Seq[DataType] = Seq(org.apache.spark.sql.types.ByteType,
      org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType,
      org.apache.spark.sql.types.FloatType,
      org.apache.spark.sql.types.DoubleType)
    (order.indexOf(a), order.indexOf(b)) match {
      case (i, j) if i >= 0 && j >= 0 => Some(order(i max j))
      case _ => None
    }
  }

  /** The single column the ptk expression depends on (reference model:
    * exactly one partition column, crates/runtime/src/mgmt.rs:666-671).
    */
  private def singleSourceAttr(ptk: Expression): Option[AttributeReference] =
    ptk.references.toSeq match {
      case Seq(a: AttributeReference) => Some(a)
      case _ => None
    }

  /** Monotone (non-decreasing) in the source column? Conservative
    * structural check covering the reference's partition-expr shapes
    * (bql.pest:49-51 arith over one column; toYYYYMM et al).
    */
  private def monotonic(e: Expression, src: AttributeReference): Boolean = e match {
    case a: AttributeReference => a.exprId == src.exprId
    case Cast(c, _, _, _) => monotonic(c, src)
    case Year(c) => monotonic(c, src)
    // toYYYYMM pattern: year(x)*100 + month(x)
    case Add(Multiply(Year(a), IntegerLiteral(100), _), Month(b), _) =>
      monotonic(a, src) && monotonic(b, src) && sameRef(a, b)
    case Add(l, Foldable(_), _) => monotonic(l, src)
    case Add(Foldable(_), r, _) => monotonic(r, src)
    case Subtract(l, Foldable(_), _) => monotonic(l, src)
    case Multiply(l, Foldable(v), _) if positive(v) => monotonic(l, src)
    case Multiply(Foldable(v), r, _) if positive(v) => monotonic(r, src)
    case Divide(l, Foldable(v), _) if positive(v) => monotonic(l, src)
    case IntegralDivide(l, Foldable(v), _) if positive(v) => monotonic(l, src)
    case _ => false
  }

  private object Foldable {
    def unapply(e: Expression): Option[Any] =
      if (e.foldable) Option(e.eval(null)) else None
  }
  private object IntegerLiteral {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case _ => None
    }
  }

  private def sameRef(a: Expression, b: Expression): Boolean =
    (a.references.toSeq, b.references.toSeq) match {
      case (Seq(x: AttributeReference), Seq(y: AttributeReference)) => x.exprId == y.exprId
      case _ => false
    }

  private def positive(v: Any): Boolean = v match {
    case i: Int => i > 0
    case l: Long => l > 0
    case d: Double => d > 0
    case f: Float => f > 0
    case d: org.apache.spark.sql.types.Decimal => d.toDouble > 0
    case s: Short => s > 0
    case b: Byte => b > 0
    case _ => false
  }

  /** Evaluate f(value) by literal substitution + const-fold. */
  private def evalAt(ptk: Expression, src: AttributeReference,
                     value: Expression): Option[Literal] =
    if (!value.foldable) None
    else try {
      val substituted = ptk.transformUp {
        case a: AttributeReference if a.exprId == src.exprId =>
          Literal.create(value.eval(null), value.dataType)
      }
      val tzDone = substituted.transformUp {
        case tz: TimeZoneAwareExpression if tz.timeZoneId.isEmpty =>
          tz.withTimeZone(spark.sessionState.conf.sessionLocalTimeZone)
      }
      if (tzDone.references.nonEmpty || !tzDone.deterministic) None
      else Some(Literal.create(tzDone.eval(null), tzDone.dataType))
    } catch { case _: Exception => None }

  /** Derive the extra `__ptk` conjunct from the filter condition. */
  private def deriveConjunct(cond: Expression, ptk: Expression,
                             src: AttributeReference,
                             ptkAttr: Attribute): Option[Expression] = {
    val mono = monotonic(ptk, src)
    // __ptk is stored as STRING (directory name); compare in f's own type
    def ptkAs(t: DataType): Expression = Cast(ptkAttr, t)
    def isSrc(e: Expression): Boolean = e match {
      case a: AttributeReference => a.exprId == src.exprId
      case Cast(a: AttributeReference, _, _, _) => a.exprId == src.exprId
      case _ => false
    }

    val conjuncts = splitAnd(cond).flatMap {
      case EqualTo(l, r) if isSrc(l) && r.foldable =>
        evalAt(ptk, src, r).map(v => EqualTo(ptkAs(v.dataType), v))
      case EqualTo(l, r) if isSrc(r) && l.foldable =>
        evalAt(ptk, src, l).map(v => EqualTo(ptkAs(v.dataType), v))
      case In(l, vs) if isSrc(l) && vs.forall(_.foldable) =>
        val mapped = vs.flatMap(v => evalAt(ptk, src, v))
        if (mapped.length == vs.length && mapped.nonEmpty)
          Some(In(ptkAs(mapped.head.dataType), mapped))
        else None
      case GreaterThan(l, r) if mono && isSrc(l) && r.foldable =>
        evalAt(ptk, src, r).map(v => GreaterThanOrEqual(ptkAs(v.dataType), v))
      case GreaterThanOrEqual(l, r) if mono && isSrc(l) && r.foldable =>
        evalAt(ptk, src, r).map(v => GreaterThanOrEqual(ptkAs(v.dataType), v))
      case LessThan(l, r) if mono && isSrc(l) && r.foldable =>
        evalAt(ptk, src, r).map(v => LessThanOrEqual(ptkAs(v.dataType), v))
      case LessThanOrEqual(l, r) if mono && isSrc(l) && r.foldable =>
        evalAt(ptk, src, r).map(v => LessThanOrEqual(ptkAs(v.dataType), v))
      // reversed operand order
      case GreaterThan(l, r) if mono && isSrc(r) && l.foldable =>
        evalAt(ptk, src, l).map(v => LessThanOrEqual(ptkAs(v.dataType), v))
      case GreaterThanOrEqual(l, r) if mono && isSrc(r) && l.foldable =>
        evalAt(ptk, src, l).map(v => LessThanOrEqual(ptkAs(v.dataType), v))
      case LessThan(l, r) if mono && isSrc(r) && l.foldable =>
        evalAt(ptk, src, l).map(v => GreaterThanOrEqual(ptkAs(v.dataType), v))
      case LessThanOrEqual(l, r) if mono && isSrc(r) && l.foldable =>
        evalAt(ptk, src, l).map(v => GreaterThanOrEqual(ptkAs(v.dataType), v))
      case _ => None
    }
    conjuncts.reduceOption(And)
  }

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }
}
