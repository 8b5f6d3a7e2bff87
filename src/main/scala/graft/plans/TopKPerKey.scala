package graft.plans

import java.util.{Comparator, PriorityQueue}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension (SURVEY §4.2 path (c)): per-key top-k as a
  * first-class plan node.
  *
  * Spark expresses "rank ≤ k per key" as Window(row_number) + Filter,
  * which shuffles EVERY row of every group and sorts whole groups
  * before the filter drops all but k. This operator prunes map-side:
  * the partial exec keeps at most k rows per key per input partition
  * (bounded heaps), so the exchange moves ≤ k·|keys| rows per
  * partition instead of the full table — at 100 TB the shuffle
  * shrinks by |rows per key|/k (orders of magnitude for hot keys),
  * exactly like partial aggregation does for SUM.
  *
  * Planned by [[GraftStrategies]]; constructed via [[TopK.perKey]].
  */
final case class TopKPerKeyPlan(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

private[plans] object TopKHeaps {

  /** Per-key bounded max-heaps: keeps the k best rows per key under
    * `ordering` (best = smallest). Returns kept rows per key.
    */
  def prune(
      rows: Iterator[InternalRow],
      keyProj: UnsafeProjection,
      ordering: Comparator[InternalRow],
      k: Int): mutable.LinkedHashMap[UnsafeRow, PriorityQueue[InternalRow]] = {
    val worstFirst = ordering.reversed() // heap head = worst kept row
    val heaps = mutable.LinkedHashMap.empty[UnsafeRow, PriorityQueue[InternalRow]]
    rows.foreach { row =>
      val key = keyProj(row)
      val heap = heaps.getOrElseUpdate(key.copy(), new PriorityQueue(worstFirst))
      if (heap.size < k) heap.offer(row.copy())
      else if (ordering.compare(row, heap.peek()) < 0) {
        heap.poll()
        heap.offer(row.copy())
      }
    }
    heaps
  }
}

/** Map-side pruning: at most k rows per key per input partition. */
final case class TopKPerKeyPartialExec(
    k: Int, keys: Seq[Expression], order: Seq[SortOrder], child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (kk, ord) = (k, order)
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val ordering = GenerateOrdering.generate(ord, childOutput)
      TopKHeaps.prune(it, keyProj, ordering, kk)
        .valuesIterator.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Reduce side: requires clustering on the keys, merges the partial
  * survivors, emits rows with their 1-based rank appended.
  */
final case class TopKPerKeyFinalExec(
    k: Int, keys: Seq[Expression], order: Seq[SortOrder],
    rankAttr: AttributeReference, child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  override def requiredChildDistribution: Seq[Distribution] =
    if (keys.isEmpty) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val (kk, ord) = (k, order)
    val outAttrs = output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keys, childOutput)
      val ordering = GenerateOrdering.generate(ord, childOutput)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      TopKHeaps.prune(it, keyProj, ordering, kk).valuesIterator.flatMap { heap =>
        val sorted = heap.iterator().asScala.toArray.sorted(
          Ordering.comparatorToOrdering(ordering))
        sorted.iterator.zipWithIndex.map { case (row, i) =>
          outProj(joined(row, InternalRow(i + 1)))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}

/** Planner strategy for graft's plan nodes (inject via
  * GraftExtensions or `spark.experimental.extraStrategies`).
  */
object GraftStrategies extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(k, keys, order, rankAttr, child) =>
      TopKPerKeyFinalExec(k, keys, order, rankAttr,
        TopKPerKeyPartialExec(k, keys, order, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Public API: `TopK.perKey(df, keys, order, k)` ≡
  * row_number().over(Window.partitionBy(keys).orderBy(order)) ≤ k,
  * with the map-side pruning plan.
  */
object TopK {
  def perKey(df: DataFrame, keyNames: Seq[String], order: Seq[Column], k: Int,
      rankName: String = "rk"): DataFrame = {
    val spark = df.sparkSession
    spark.experimental.extraStrategies =
      (GraftStrategies +: spark.experimental.extraStrategies.filterNot(_ == GraftStrategies))
    val analyzed = df.queryExecution.analyzed
    def resolve(name: String): Attribute = analyzed.output
      .find(_.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(s"column $name not in ${analyzed.output}"))
    val keyExprs: Seq[Expression] = keyNames.map(resolve)
    // let the real analyzer turn the Columns into resolved SortOrders
    // (Spark 4 Columns carry ColumnNodes, not catalyst expressions)
    val sortOrders: Seq[SortOrder] = df.sort(order: _*).queryExecution.analyzed
      .collectFirst { case s: org.apache.spark.sql.catalyst.plans.logical.Sort => s.order }
      .getOrElse(throw new IllegalStateException("sort resolution failed"))
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    org.apache.spark.sql.GraftShim.ofRows(spark,
      TopKPerKeyPlan(k, keyExprs, sortOrders, rankAttr, analyzed))
  }
}
