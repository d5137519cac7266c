package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.Bridge

import scala.collection.mutable

/** Whole-operator top-k-per-group (SURVEY.md §3: custom LogicalPlan +
  * Strategy + SparkPlan).
  *
  * The composed form (window `row_number` + filter) must fully SORT
  * every group before ranking — O(n log n) per partition and a complete
  * materialization. This operator keeps one bounded k-row heap per
  * group: O(n log k), constant memory per group, one shuffle on the
  * group key. At 100 TB with millions of groups, that's the difference
  * between a sort-spill pipeline and a streaming fold.
  *
  * Top-k is a monoid (the global top-k of a union is the top-k of the
  * per-part top-ks), so the strategy plans it like an aggregate:
  * PARTIAL pass on the map side (no distribution requirement — reduces
  * every partition to ≤ k rows per group before the exchange) then a
  * FINAL pass after the shuffle. Shuffle volume is min(input,
  * groups × partitions × k) rows, not the input.
  */
case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: SparkPlan, partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  /** The partial pass folds whatever partitioning the child has; only
    * the final pass needs the groups co-located (EnsureRequirements
    * inserts the hash exchange between the two).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial)
      org.apache.spark.sql.catalyst.plans.physical.UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = RowOrdering.create(order, childOutput)
      // max-heap under `ord`: head = current worst of the kept k
      val heapOrd: Ordering[UnsafeRow] = ord.on((r: UnsafeRow) => r: InternalRow)
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      rows.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](heapOrd)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < k) heap.enqueue(rowProj(row).copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(rowProj(row).copy())
        }
      }
      heaps.valuesIterator.flatMap(_.toSeq.sorted(ord))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(group, order, k, child) =>
      TopKPerGroupExec(group, order, k,
        TopKPerGroupExec(group, order, k, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Ensure the strategy is active on this session (idempotent; also
    * injectable via `spark.sql.extensions` → [[graft.GraftExtensions]]).
    */
  def register(spark: SparkSession): Unit = {
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(TopKStrategy))
      spark.experimental.extraStrategies = strategies :+ TopKStrategy
    val opts = spark.experimental.extraOptimizations
    if (!opts.contains(TopKRewrite))
      spark.experimental.extraOptimizations = opts :+ TopKRewrite
  }

  /** Top `k` rows per group under `orderBy` (ascending unless the Column
    * carries a sort order, e.g. `col.desc`).
    */
  def perGroup(df: DataFrame, groupCols: Seq[Column], orderBy: Seq[Column],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val analyzed = Bridge.analyzed(df)
    val group = groupCols.map(Bridge.expression)
    val order = orderBy.map(Bridge.expression).map {
      case s: SortOrder => s
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    Bridge.ofRows(spark, TopKPerGroup(group, order, k, analyzed))
  }
}
