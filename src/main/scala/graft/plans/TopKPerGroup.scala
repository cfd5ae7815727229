package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst extension (the (c) tier: custom LogicalPlan +
  * SparkStrategy + SparkPlan, registered via SparkSessionExtensions):
  * top-k per group with a BOUNDED HEAP per group instead of the window
  * `row_number() <= k` plan.
  *
  * Why a custom operator: the window form shuffles on the group key and
  * then SORTS EVERY ROW of every partition (plus, under AQE, carries
  * the full sorted run) only to discard all but k per group. This
  * operator holds one k-bounded heap per group — O(groups·k) memory, no
  * sort, no spill pressure — and emits ranked winners directly. Same
  * single shuffle (`ClusteredDistribution` on the keys), strictly less
  * work after it: the classic heap-vs-sort top-k trade, lifted into a
  * physical operator.
  *
  * Correctness face: `q_topk_native` runs this operator against the SAME
  * DuckDB oracle as the window-based `q_topk_per_group` — hash-equal
  * results prove the operator end-to-end. Determinism: the ordering must
  * be total (include a unique tiebreaker), exactly like the window form.
  */
case class TopKPerGroup(keys: Seq[Expression], order: Seq[SortOrder],
                        k: Int, rankAttr: Attribute,
                        child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(keys, order, k, rankAttr, child) =>
      TopKPerGroupExec(keys, order, k, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(keys: Seq[Expression], order: Seq[SortOrder],
                            k: Int, rankAttr: Attribute,
                            child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  /** One shuffle on the group keys — the same exchange the window form
    * needs, but nothing requires a sort afterwards. */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(keys))

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  private val rankAttrIsInt: Boolean =
    rankAttr.dataType == org.apache.spark.sql.types.IntegerType

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val outAttrs = output
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // PriorityQueue dequeues the MAX w.r.t. the ordering = the worst
      // kept row (rank-k); better rows compare smaller
      val rowOrd: Ordering[InternalRow] =
        (a: InternalRow, b: InternalRow) => ord.compare(a, b)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](rowOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) heap += row.copy()
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap += row.copy()
        }
      }
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      // the rank attr is LongType from the DataFrame face but
      // IntegerType when WindowTopKRule reuses a row_number() output
      val rankIsInt = rankAttrIsInt
      heaps.valuesIterator.flatMap { heap =>
        // dequeueAll yields worst-first; reverse to rank 1..size
        val best = heap.dequeueAll.reverse
        best.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, if (rankIsInt) i + 1 else (i + 1).toLong)
          outProj(joined(row, rankRow))
        }
      }
    }
  }
}

object TopKPerGroup {
  /** DataFrame face: append `rankName` (long, 1-based) and keep only the
    * top `k` rows per `keys` group, ordered by `orderBy` as
    * (columnName, ascending) pairs — which must form a total order for
    * deterministic results. Names resolve against `df`'s own schema, so
    * the node enters the plan fully resolved. */
  def topK(df: DataFrame, keys: Seq[String], orderBy: Seq[(String, Boolean)],
           k: Int, rankName: String = "rank"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val child = ColumnBridge.logicalPlan(df)
    def attr(n: String): Attribute = child.output.filter(_.name == n) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"column $n not in ${child.output.map(_.name).mkString(", ")}")
      case many => throw new IllegalArgumentException(
        s"column $n is ambiguous: ${many.size} matches — disambiguate before topK")
    }
    val sortOrders = orderBy.map { case (n, asc) =>
      SortOrder(attr(n),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    val plan = TopKPerGroup(keys.map(attr), sortOrders, k, rankAttr, child)
    ColumnBridge.ofRows(df.sparkSession, plan)
  }
}
