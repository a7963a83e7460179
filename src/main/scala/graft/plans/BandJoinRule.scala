package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** G28: automatic band-join binning — the optimizer rewrite that makes a
  * naive `x BETWEEN y + lo AND y + hi` join scale.
  *
  * A join whose condition bounds the DIFFERENCE of two integral columns
  * from both sides ("band" / range join — the E17 shape written naively)
  * is planned by vanilla Spark as either a BroadcastNestedLoopJoin (no
  * equi conjunct) or a hash join on the remaining equi keys with the band
  * as a post-join filter (a per-key cross product on hot keys). Both
  * degenerate at 100 TB. The scale-safe form is the standard bin
  * decomposition (see [[graft.operators.Analytics.qRangeJoin]] for the
  * hand-written exemplar): bucket both sides into windows of the band
  * width, fan the `y` side out to {bin, bin+1}, equi-join on the bin, and
  * re-apply the exact predicate. This rule performs that rewrite
  * automatically, so a user can write the natural BETWEEN join and still
  * get a bounded hash join — the same service Databricks' range-join
  * optimization provides behind a hint, here derived from the predicate
  * itself.
  *
  * Soundness of the 2-bin fan-out: with binW = max(hi - lo, 1), the
  * admissible x-interval [y+lo, y+hi] has length ≤ binW, so
  * floor(x/binW) ∈ {floor((y+lo)/binW), floor((y+lo)/binW) + 1}; the two
  * exploded bins cover every match (losslessness), and since the two bin
  * values differ, no (x, y) pair can match twice (no duplicates). The
  * original band conjuncts stay in the join condition, so the rewrite can
  * never widen the result. Floor division is exact for negatives via
  * `(a - pmod(a, w)) div w` — all integer arithmetic, no IEEE anywhere.
  *
  * Join types: Inner, LeftOuter, LeftSemi and LeftAnti rewrite with the
  * fan-out on the RIGHT side — the left is never duplicated, so
  * unmatched-left semantics (outer padding, semi existence, anti
  * absence) are preserved exactly: a true match is always bin-covered,
  * and per (l, r) pair at most one replica matches. RightOuter mirrors:
  * the band is reflected (y ∈ [x−hi, x−lo]) and the LEFT side fans out,
  * keeping the null-padded right rows single. FullOuter cannot keep
  * both sides un-duplicated and is never touched.
  *
  * Scope guards (all conservative — when in doubt, leave the join alone):
  *   - the join types above with deterministic conditions only;
  *   - both band operands integral (long/int), deterministic, non-foldable;
  *   - both a lower AND an upper bound on the same (x, y) pair — one-sided
  *     inequalities (as-of joins) and interval-overlap joins (bounds on
  *     two DIFFERENT pairs) are never touched;
  *   - joins that are ALREADY keyed by an equi conjunct derived from the
  *     band operands are skipped: each equi side is resolved through the
  *     child plans' Project/Aggregate/Generate alias chains to its source
  *     columns, and an equi key rooted in the same source columns as the
  *     band (a hand-built bin column — or this rule's own output, making
  *     the rewrite idempotent under the optimizer's fixpoint batch) marks
  *     the join as binned.
  *
  * Disable with `graft.bandjoin.rewrite=false` (differential spec:
  * BandJoinRuleSpec proves result equality on/off and the plan upgrade
  * from BroadcastNestedLoopJoin to an equi join). */
object BandJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** d = x - y bounded: d >= k (isLower) or d <= k; x from left side. */
  private case class Bound(x: Expression, y: Expression, isLower: Boolean, k: Long)

  private object ILit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case Literal(v: Long, LongType) => Some(v)
      case Cast(ILit(v), LongType, _, _) => Some(v)
      case _ => None
    }
  }

  /** e == base + offset with integral, deterministic, non-foldable base. */
  private def linear(e: Expression): Option[(Expression, Long)] = e match {
    case Add(l, ILit(c), _) => linear(l).map { case (b, o) => (b, o + c) }
    case Add(ILit(c), r, _) => linear(r).map { case (b, o) => (b, o + c) }
    case Subtract(l, ILit(c), _) => linear(l).map { case (b, o) => (b, o - c) }
    case _ if e.deterministic && !e.foldable && e.references.nonEmpty &&
      (e.dataType == LongType || e.dataType == IntegerType) => Some((e, 0L))
    case _ => None
  }

  /** Normalize one comparison conjunct to a Bound, if it is one. Every
    * comparison reduces to `a < b` / `a <= b` by operand swap; both the
    * two-sided form (`x cmp y + c`) and the difference form
    * (`x - y cmp c`) are recognized. */
  private def bound(c: Expression, lset: AttributeSet, rset: AttributeSet): Option[Bound] = {
    def integralBase(e: Expression): Boolean =
      e.deterministic && !e.foldable && e.references.nonEmpty &&
        (e.dataType == LongType || e.dataType == IntegerType)
    // e = sgn * (x - y) with x strictly left-side, y strictly right-side
    object Diff {
      def unapply(e: Expression): Option[(Expression, Expression, Int)] = e match {
        case Subtract(p, q, _) if integralBase(p) && integralBase(q) =>
          if (p.references.subsetOf(lset) && q.references.subsetOf(rset))
            Some((p, q, 1))
          else if (p.references.subsetOf(rset) && q.references.subsetOf(lset))
            Some((q, p, -1))
          else None
        case _ => None
      }
    }
    // a <= b (strict: a < b) over integral operands
    def le(a: Expression, b: Expression, strict: Boolean): Option[Bound] = {
      def upper(x: Expression, y: Expression, k: Long) =
        Some(Bound(x, y, isLower = false, if (strict) k - 1 else k))
      def lower(x: Expression, y: Expression, k: Long) =
        Some(Bound(x, y, isLower = true, if (strict) k + 1 else k))
      (linear(a), linear(b)) match {
        case (Some((ab, ao)), Some((bb, bo)))
            if ab.references.subsetOf(lset) && bb.references.subsetOf(rset) =>
          upper(ab, bb, bo - ao) // (x - y) <= bo - ao
        case (Some((ab, ao)), Some((bb, bo)))
            if ab.references.subsetOf(rset) && bb.references.subsetOf(lset) =>
          lower(bb, ab, ao - bo) // (x - y) >= ao - bo
        case (Some((Diff(x, y, sgn), ao)), _) => b match {
          case ILit(c) =>
            if (sgn > 0) upper(x, y, c - ao) // (x - y) <= c - ao
            else lower(x, y, ao - c) // (x - y) >= ao - c
          case _ => None
        }
        case (_, Some((Diff(x, y, sgn), bo))) => a match {
          case ILit(c) =>
            if (sgn > 0) lower(x, y, c - bo) // (x - y) >= c - bo
            else upper(x, y, bo - c) // (x - y) <= bo - c
          case _ => None
        }
        case _ => None
      }
    }
    c match {
      case LessThan(a, b) => le(a, b, strict = true)
      case LessThanOrEqual(a, b) => le(a, b, strict = false)
      case GreaterThan(a, b) => le(b, a, strict = true)
      case GreaterThanOrEqual(a, b) => le(b, a, strict = false)
      case _ => None
    }
  }

  /** Source columns of `e`, resolving Project/Aggregate/Generate-produced
    * attributes in `plan` down to base relation output. */
  private def rootRefs(e: Expression, plan: LogicalPlan): Set[ExprId] = {
    val amap: Map[ExprId, Expression] = plan.collect {
      case p: Project =>
        p.projectList.collect { case a: Alias => a.exprId -> a.child }
      case a: Aggregate =>
        a.aggregateExpressions.collect { case al: Alias => al.exprId -> al.child }
      case g: Generate =>
        g.generatorOutput.map(o => o.exprId -> (g.generator: Expression))
    }.flatten.toMap
    val roots = mutable.Set[ExprId]()
    val seen = mutable.Set[ExprId]()
    var frontier: List[Attribute] = e.references.toSeq.toList
    while (frontier.nonEmpty) {
      val a = frontier.head
      frontier = frontier.tail
      if (seen.add(a.exprId)) amap.get(a.exprId) match {
        case Some(ex) => frontier = ex.references.toSeq.toList ::: frontier
        case None => roots += a.exprId
      }
    }
    roots.toSet
  }

  /** floor(a / w) exact for negative a: numerator is a multiple of w, so
    * truncating division equals floor division. */
  private def floorDiv(a: Expression, w: Long): Expression = {
    val wl = Literal(w)
    IntegralDivide(Subtract(a, Pmod(a, wl)), wl)
  }

  private def toLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  private def enabled: Boolean =
    // lenient parse: a malformed value must disable-or-enable cleanly,
    // never throw inside the optimizer batch (which would fail EVERY
    // query in the session, not just band joins)
    conf.getConfString("graft.bandjoin.rewrite", "true")
      .trim.toLowerCase match {
      case "false" | "0" | "off" | "disabled" | "no" => false
      case "true" | "1" | "on" | "enabled" | "yes" | "" => true
      case other =>
        // unrecognized (a typo like 'flase' or 'disable') falls back to
        // enabled — warn so the silent direction of the fallback is at
        // least visible to a user who meant to disable
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"graft.bandjoin.rewrite='$other' is not a recognized " +
            "true/false token; defaulting to ENABLED")
        true
    }

  /** Join types safe to rewrite with the fan-out on the right side (the
    * left is never duplicated, so padding/existence/absence semantics
    * survive); RightOuter mirrors with the fan-out on the left. */
  private val fanRightTypes: Set[JoinType] = Set(Inner, LeftOuter, LeftSemi, LeftAnti)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, jt, Some(cond), hint)
          if (fanRightTypes(jt) || jt == RightOuter) && cond.deterministic =>
        rewrite(j, left, right, cond, hint).getOrElse(j)
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val bounds = conjuncts.flatMap(bound(_, left.outputSet, right.outputSet))
    if (bounds.isEmpty) return None
    // complete bands: first (x, y) pair carrying both a lower and an upper
    val keys = bounds.map(b => (b.x.canonicalized, b.y.canonicalized)).distinct
    val band = keys.iterator.flatMap { key =>
      val bs = bounds.filter(b => (b.x.canonicalized, b.y.canonicalized) == key)
      val los = bs.filter(_.isLower).map(_.k)
      val his = bs.filterNot(_.isLower).map(_.k)
      if (los.isEmpty || his.isEmpty) None
      else {
        val lo = los.max
        val hi = his.min
        if (hi >= lo) Some((bs.head.x, bs.head.y, lo, hi)) else None
      }
    }.toSeq.headOption
    band.flatMap { case (x, y, lo, hi) =>
      // skip joins already keyed by something derived from the band
      // operands (hand-binned queries, or this rule's own prior output)
      val xRoots = rootRefs(x, left)
      val yRoots = rootRefs(y, right)
      val alreadyBinned = conjuncts.exists {
        case e @ (_: EqualTo | _: EqualNullSafe) =>
          val (a, b) = e match {
            case EqualTo(a, b) => (a, b)
            case EqualNullSafe(a, b) => (a, b)
          }
          val sided: Option[(Expression, Expression)] =
            if (a.references.subsetOf(left.outputSet) &&
              b.references.subsetOf(right.outputSet)) Some((a, b))
            else if (a.references.subsetOf(right.outputSet) &&
              b.references.subsetOf(left.outputSet)) Some((b, a))
            else None // not a clean equi key; says nothing about binning
          sided.exists { case (le, re) =>
            rootRefs(le, left).intersect(xRoots).nonEmpty &&
              rootRefs(re, right).intersect(yRoots).nonEmpty
          }
        case _ => false
      }
      // Overflow guard: binW = hi − lo and the bin offsets y+lo / x−hi
      // use plain Long arithmetic. |lo|, |hi| ≤ 2^31 keeps the offsets
      // exact for any operand up to ±2^62 (beyond which a "time-like"
      // integral column is pathological), and hi − lo cannot wrap. A
      // band wider than 2^31 stays on the naive plan — correct, just
      // unrewritten — instead of risking silently dropped matches.
      val offsetsSafe = math.abs(lo) <= (1L << 31) && math.abs(hi) <= (1L << 31)
      if (alreadyBinned || !offsetsSafe) None
      else {
        val binW = math.max(hi - lo, 1L)
        val binAttr = AttributeReference("__graft_bin", LongType)()
        val newJoin = if (fanRightTypes(j.joinType)) {
          // x (left) is the point, y (right) fans to {bin, bin+1}
          val binL = Alias(floorDiv(toLong(x), binW), "__graft_bin_l")()
          val ybin0 = floorDiv(Add(toLong(y), Literal(lo)), binW)
          val projL = Project(left.output :+ binL, left)
          val gen = Generate(
            Explode(CreateArray(Seq(ybin0, Add(ybin0, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(binAttr), child = right)
          val newCond = And(EqualTo(binL.toAttribute, binAttr), cond)
          Join(projL, gen, j.joinType, Some(newCond), hint)
        } else {
          // RightOuter: reflect the band (y ∈ [x−hi, x−lo]) so the RIGHT
          // side stays single (y is the point) and the LEFT fans out
          val binR = Alias(floorDiv(toLong(y), binW), "__graft_bin_r")()
          val xbin0 = floorDiv(Add(toLong(x), Literal(-hi)), binW)
          val projR = Project(right.output :+ binR, right)
          val gen = Generate(
            Explode(CreateArray(Seq(xbin0, Add(xbin0, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(binAttr), child = left)
          val newCond = And(EqualTo(binAttr, binR.toAttribute), cond)
          Join(gen, projR, RightOuter, Some(newCond), hint)
        }
        Some(Project(j.output, newJoin))
      }
    }
  }
}
