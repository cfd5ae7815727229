package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator Catalyst extension #2: AS-OF JOIN as a native
  * physical operator (left-outer) — for each left row, the LAST right
  * row with the same key whose ordering tuple is `<=` the left row's
  * (backward mode, the reference's "most recent prior event" semantics;
  * J5, window formulation in EventOps.lastViewBeforePurchase), or with
  * `forward = true` the FIRST right row strictly after it (next-event
  * lookups). Both directions are the same single forward merge scan —
  * forward mode PEEKS its match instead of consuming it.
  *
  * Why a custom operator: Spark has no as-of join node. The window
  * rewrite UNIONs both sides so the right side's columns ride along as
  * nulls through a full sort of left+right together, and composing it
  * requires the sides to share a schema. The native node keeps the
  * sides separate — each shuffles ONCE on its own key and sorts only
  * itself — then a single forward merge scan pairs them: O(1) state
  * per key (the one candidate row), no interval explosion, no
  * windowed carry columns. This is exactly the shape that survives a
  * 100 TB fact side joined to a 100 GB quote/status side.
  *
  * Determinism: callers must make the right ordering total (include a
  * unique tiebreaker) so "last `<=`" is unambiguous — same contract as
  * the window form. Correctness face: `q_asof_native` runs against the
  * SAME DuckDB oracle as the window-based `ev_asof`.
  */
case class AsOfJoin(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                    leftOrd: Seq[Expression], rightOrd: Seq[Expression],
                    forward: Boolean, tolerance: Option[Long],
                    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(lk, rk, lo, ro, fwd, tol, l, r) =>
      AsOfJoinExec(lk, rk, lo, ro, fwd, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftOrd: Seq[Expression], rightOrd: Seq[Expression],
                        forward: Boolean, tolerance: Option[Long],
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {
  // The merge scan builds its comparators from the LEFT side's types and
  // applies them to right-side rows (and key matches are UnsafeRow
  // byte-equality), so mismatched side types would corrupt silently —
  // make them a plan-time error instead.
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of join key types must match pairwise: " +
      s"left=${leftKeys.map(_.dataType)} right=${rightKeys.map(_.dataType)}")
  require(leftOrd.map(_.dataType) == rightOrd.map(_.dataType),
    s"as-of join ordering types must match pairwise: " +
      s"left=${leftOrd.map(_.dataType)} right=${rightOrd.map(_.dataType)}")
  tolerance.foreach { t =>
    require(t >= 0, s"tolerance must be >= 0: $t")
    // the band check reads getLong(0) on BOTH sides' leading ord column
    require(leftOrd.head.dataType == org.apache.spark.sql.types.LongType &&
        rightOrd.head.dataType == org.apache.spark.sql.types.LongType,
      "tolerance requires LongType leading ordering columns on both sides")
  }

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Each side shuffles once on its own key (co-partitioned by
    * EnsureRequirements — the SortMergeJoin contract). */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  /** In-partition sort by (key, ord) on both sides — the merge scan's
    * only precondition; Spark inserts the sorts. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ leftOrd).map(SortOrder(_, Ascending)),
    (rightKeys ++ rightOrd).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys ++ leftOrd).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val (lk, rk, lo, ro) = (leftKeys, rightKeys, leftOrd, rightOrd)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lOrdProj = UnsafeProjection.create(lo, lOut)
      val rOrdProj = UnsafeProjection.create(ro, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val ordOrd = RowOrdering.createNaturalAscendingOrdering(lo.map(_.dataType))
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      // single-candidate merge state: iterators reuse row buffers, so
      // the buffered right head and the kept candidate are copies
      var rHead: InternalRow = if (rIt.hasNext) rIt.next().copy() else null
      var candidate: InternalRow = null
      var candidateKey: UnsafeRow = null
      val fwd = forward
      val tol = tolerance
      // tolerance gates EMISSION only: the as-of pick is the closest
      // qualifying row, so if IT is out of band every other row is too
      def inBand(lt: InternalRow, m: InternalRow): Boolean = tol.forall { t =>
        val gap = lt.getLong(0) - rOrdProj(m).getLong(0)
        (if (fwd) -gap else gap) <= t
      }
      lIt.map { l =>
        val key = lKeyProj(l)
        val lt = lOrdProj(l)
        if (fwd) {
          // FORWARD: the first right row strictly after the left tuple.
          // Skipped rows (key behind, or same-key ord <= lt) can never
          // match a later left row either (left is ascending), so the
          // scan never backs up; the match is PEEKED, not consumed —
          // the same right row can serve several left rows.
          while (rHead != null && {
            val kc = keyOrd.compare(rKeyProj(rHead), key)
            kc < 0 || (kc == 0 && ordOrd.compare(rOrdProj(rHead), lt) <= 0)
          }) rHead = if (rIt.hasNext) rIt.next().copy() else null
          val m = if (rHead != null && rKeyProj(rHead) == key &&
            inBand(lt, rHead)) rHead else nullRight
          outProj(joined(l, m))
        } else {
          if (candidateKey != null && candidateKey != key) {
            candidate = null; candidateKey = null
          }
          // discard right runs for keys before this left key
          while (rHead != null && keyOrd.compare(rKeyProj(rHead), key) < 0)
            rHead = if (rIt.hasNext) rIt.next().copy() else null
          // absorb same-key right rows up to (<=) the left ordering tuple;
          // the last absorbed is the as-of match (right sorted ascending)
          while (rHead != null && rKeyProj(rHead) == key &&
              ordOrd.compare(rOrdProj(rHead), lt) <= 0) {
            candidate = rHead
            if (candidateKey == null) candidateKey = key.copy()
            rHead = if (rIt.hasNext) rIt.next().copy() else null
          }
          outProj(joined(l,
            if (candidate != null && inBand(lt, candidate)) candidate
            else nullRight))
        }
      }
    }
  }
}

object AsOfJoin {
  /** DataFrame face: left-outer backward as-of join. For each left row,
    * append the last right row (same key) whose `rightOrd` tuple is <=
    * the left row's `leftOrd` tuple; right columns are null when no such
    * row exists. `rightOrd` must be a total order within a key for
    * deterministic picks. Column names must be unambiguous across the
    * two inputs (alias before joining, as with any join).
    *
    * `tolerance` (pandas merge_asof semantics): when set, the match is
    * additionally required to lie within `tolerance` of the left row on
    * the LEADING ordering column (which must be a long — epoch
    * micros/days/etc.); out-of-band lefts get nulls. Gates emission
    * only — the merge scan is unchanged, because the as-of pick is the
    * closest qualifying row, so if it is out of band every other
    * candidate is too. */
  def asOf(leftDf: DataFrame, rightDf: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftOrd: Seq[String], rightOrd: Seq[String],
           forward: Boolean = false,
           tolerance: Option[Long] = None): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      "as-of join needs matching non-empty key lists")
    require(leftOrd.nonEmpty && leftOrd.length == rightOrd.length,
      "as-of join needs matching non-empty ordering lists")
    val lp = ColumnBridge.logicalPlan(leftDf)
    val rp = ColumnBridge.logicalPlan(rightDf)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.filter(_.name == n) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $n not in ${p.output.map(_.name).mkString(", ")}")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous: ${many.size} matches")
      }
    val plan = AsOfJoin(
      leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
      leftOrd.map(attr(lp, _)), rightOrd.map(attr(rp, _)), forward, tolerance,
      lp, rp)
    ColumnBridge.ofRows(leftDf.sparkSession, plan)
  }
}
