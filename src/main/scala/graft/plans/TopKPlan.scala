package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst extension: per-group top-k with bounded heaps
  * (SURVEY §4.3 preference order (c): LogicalPlan + SparkStrategy +
  * SparkPlan, injected via [[GraftExtensions]]).
  *
  * The window formulation (`row_number().over(partitionBy(keys).orderBy
  * (order)) <= k`) shuffles EVERY row, then fully sorts every group, then
  * discards all but k rows per group. This operator plans as two execs:
  * a map-side partial pass that keeps at most k rows per (group, input
  * partition) — so the shuffle moves ≤ k·partitions rows per group, not
  * the group's whole population — and a final pass after the exchange
  * that merges to the true per-group top k and attaches ranks. Each pass
  * holds one k-bounded binary heap per group (memory k·|groups per
  * partition| rows, no full sort anywhere); the comparator is a
  * codegen-generated row ordering.
  *
  * `order` must be a total order (add a unique tie-break) for the result
  * to be deterministic — the same contract as the window formulation.
  */
case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
  k: Int, rankAttr: Attribute, child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  // rankAttr is GENERATED here, not read from the child — without this
  // the analyzer reports it as a missing input attribute
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override protected def withNewChildInternal(c: LogicalPlan): TopKPerGroup =
    copy(child = c)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression],
  order: Seq[SortOrder], k: Int, rankAttr: Option[Attribute],
  child: SparkPlan) extends UnaryExecNode {

  private def isFinal = rankAttr.isDefined

  override def output: Seq[Attribute] = child.output ++ rankAttr

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr.toSeq)

  override def requiredChildDistribution: Seq[Distribution] =
    if (!isFinal) UnspecifiedDistribution :: Nil
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupLocal = groupExprs
    val orderLocal = order
    val childOutput = child.output
    val emitRank = isFinal
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupLocal, childOutput)
      val ordering = GenerateOrdering.generate(orderLocal, childOutput)
      // per-group max-heap of the k best rows: the heap head is the WORST
      // kept row, so a new row replaces it iff it orders strictly before
      val heaps = new java.util.LinkedHashMap[UnsafeRow,
        java.util.PriorityQueue[InternalRow]]()
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ordering.compare(b, a) // reversed: head = last in sort order
      }
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val groupsIt = heaps.entrySet().iterator()
      new Iterator[InternalRow] {
        private var pending: Array[InternalRow] = Array.empty
        private var rank = 0
        private val joined = new JoinedRow
        private val rankRow =
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        private val outProj = UnsafeProjection.create(
          output.map(_.dataType).toArray)
        override def hasNext: Boolean =
          rank < pending.length || groupsIt.hasNext
        override def next(): InternalRow = {
          if (rank >= pending.length) {
            val heap = groupsIt.next().getValue
            pending = new Array[InternalRow](heap.size)
            var i = pending.length - 1
            while (i >= 0) { pending(i) = heap.poll(); i -= 1 }
            rank = 0
          }
          val row = pending(rank)
          rank += 1
          if (emitRank) {
            rankRow.setLong(0, rank.toLong)
            outProj(joined(row, rankRow))
          } else row
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerGroupExec =
    copy(child = c)
}

/** Plans [[TopKPerGroup]] as partial → (exchange inserted by
  * EnsureRequirements) → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(keys, order, k, rank, child) =>
      val partial = TopKPerGroupExec(keys, order, k, None, planLater(child))
      TopKPerGroupExec(keys, order, k, Some(rank), partial) :: Nil
    case _ => Nil
  }
}

/** Public DSL entry points for the custom operators. */
object GraftOps {

  /** Top `k` rows per group of `keys` under `order` (must be total for
    * determinism), with a `rankName` bigint rank column appended —
    * the scale-safe replacement for
    * `row_number().over(Window.partitionBy(keys).orderBy(order)) <= k`. */
  def topKPerGroup(df: DataFrame, keys: Seq[Column], order: Seq[Column],
    k: Int, rankName: String = "rn"): DataFrame = {
    // k <= 0 would reach the executor heap as an empty-heap peek and
    // die in a codegen comparator NPE with no hint the input was k
    require(k >= 1, s"topKPerGroup needs k >= 1, got $k")
    val spark = df.sparkSession
    // runtime fallback for sessions built without
    // spark.sql.extensions=graft.plans.GraftExtensions (public API)
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val analyzed = df.queryExecution.analyzed
    def resolve(c: Column): Expression = {
      val e = org.apache.spark.sql.graft.DatasetBridge.expression(spark, c)
      e.transformUp {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          // the plan's own resolver: case sensitivity per
          // spark.sql.caseSensitive, qualified names (t.col) handled,
          // ambiguity is an error — identical to how any built-in
          // operator would bind the column
          analyzed.resolve(u.nameParts,
            spark.sessionState.analyzer.resolver).getOrElse(
            throw new IllegalArgumentException(
              s"column ${u.name} not in ${analyzed.output.map(_.name)}"))
      }
    }
    val sortOrders = order.map(resolve(_) match {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    })
    val rank = AttributeReference(rankName, LongType, nullable = false)()
    org.apache.spark.sql.graft.DatasetBridge.ofRows(spark,
      TopKPerGroup(keys.map(resolve), sortOrders, k, rank, analyzed))
  }
}
