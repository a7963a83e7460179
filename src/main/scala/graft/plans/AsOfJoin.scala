package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF join as a first-class operator (SURVEY §2 E11-native).
  *
  * Spark has no native ASOF JOIN; the composable workaround is a tagged
  * union + window scan (AnalyticsExt.qAsofJoin). This is the
  * whole-operator路 (c) path from the build plan: a custom LogicalPlan,
  * planner Strategy, and physical merge operator registered through
  * SparkSessionExtensions.
  *
  * Semantics: for each left row, the right row with the same key and the
  * greatest ts ≤ left.ts (left outer: unmatched → nulls). Physical plan:
  * both children hash-clustered on the key and sorted by (key, ts) —
  * Catalyst's EnsureRequirements inserts the exchanges/sorts — then a
  * single forward merge pass per partition: O(n+m), no buffering beyond
  * one lookahead row, no per-key grouping materialization. At 100 TB this
  * is one co-partitioned shuffle per side, the same cost envelope as a
  * sort-merge join.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Expression,
    forward: Boolean = false,
    tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the physical operator. */
object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, rtb, fw, tol) =>
      AsOfJoinExec(lk, rk, lts, rts, rtb, fw, tol,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Merge-scan as-of join.
  *  - `forward = false` (default): latest right ts ≤ left ts — both sides
  *    sorted ts-ascending.
  *  - `forward = true`: earliest right ts ≥ left ts — both sides sorted
  *    ts-DESCENDING, which turns the forward search into the same
  *    one-lookahead merge under the reversed comparator.
  *  - `tolerance = Some(t)`: the match must additionally satisfy
  *    |left.ts − right.ts| ≤ t (numeric ts required); out-of-tolerance
  *    left rows emit null-padded, matching SQL left-outer semantics. */
case class AsOfJoinExec(
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    rightTieBreak: Expression,
    forward: Boolean,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  private def tsDir: org.apache.spark.sql.catalyst.expressions.SortDirection =
    if (forward) org.apache.spark.sql.catalyst.expressions.Descending
    else org.apache.spark.sql.catalyst.expressions.Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
            SortOrder(leftTs, tsDir)),
        Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
            SortOrder(rightTs, tsDir),
            // deterministic winner among equal-ts right rows
            SortOrder(rightTieBreak, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = PhysicalDataType.ordering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    // under the reversed comparator the forward search IS the backward
    // merge: "rt ≤' lt" means rt ≥ lt, "latest ≤' lt" means earliest ≥ lt
    val baseTsOrd = PhysicalDataType.ordering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val tsOrd = if (forward) baseTsOrd.reverse else baseTsOrd
    val tol = tolerance
    val fwd = forward
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.length
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      // one-row lookahead over the right side
      var rNext: InternalRow = null
      def advanceRight(): Unit =
        rNext = if (rIter.hasNext) rIter.next().copy() else null
      advanceRight()
      // latest right row already consumed for the current key; a
      // dedicated flag (not curKey == null) marks the unset state so a
      // legitimate null key is never conflated with "no key seen yet"
      var hasCurKey = false
      var curKey: Any = null
      var curMatch: InternalRow = null
      var curMatchTs: Any = null

      lIter.map { lRow =>
        val lk = lKeyB.eval(lRow)
        val lt = lTsB.eval(lRow)
        if (lk == null || lt == null) {
          // SQL comparison with NULL is never true → no match, null-padded
          proj(joined(lRow, nullRight))
        } else {
          // consume right rows that are candidates for this left row
          var continue = rNext != null
          while (continue) {
            val rk = rKeyB.eval(rNext)
            val rt = rTsB.eval(rNext)
            if (rk == null || rt == null) {
              // null key/ts can never match any left row — skip it
              advanceRight()
              continue = rNext != null
            } else {
              val kc = keyOrd.compare(rk, lk)
              if (kc < 0 || (kc == 0 && tsOrd.compare(rt, lt) <= 0)) {
                if (!hasCurKey || keyOrd.compare(rk, curKey) != 0) {
                  hasCurKey = true
                  curKey = rk
                  curMatch = null
                  curMatchTs = null
                }
                if (kc == 0) { curMatch = rNext; curMatchTs = rt }
                advanceRight()
                continue = rNext != null
              } else continue = false
            }
          }
          val matched = curMatch != null && hasCurKey &&
            keyOrd.compare(curKey, lk) == 0 &&
            tol.forall { t =>
              val l = lt.asInstanceOf[Number].longValue
              val r = curMatchTs.asInstanceOf[Number].longValue
              (if (fwd) r - l else l - r) <= t
            }
          proj(joined(lRow, if (matched) curMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}
