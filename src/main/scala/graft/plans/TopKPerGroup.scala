package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Top-k rows per group as a FIRST-CLASS physical operator — SURVEY.md §2
  * preference path (c): a custom `LogicalPlan` + `SparkStrategy` +
  * `SparkPlan`, the whole-operator extension point.
  *
  * Why Spark's built-ins aren't enough here: the declarative formulation
  * (`row_number().over(Window.partitionBy(g).orderBy(o)) <= k`) plans as
  * Exchange → **full Sort of every group** → WindowExec → Filter. All n
  * rows per group are shuffled and sorted to keep k. The same asymmetry
  * TakeOrderedAndProject exploits for global LIMIT (heap instead of sort)
  * applies per group, but Catalyst has no per-group variant — so this node
  * supplies one:
  *
  *  - partial pass (map side): one bounded max-heap of size k per group per
  *    partition — O(rows · log k) time, O(groups_in_partition · k) memory,
  *    no sort, no shuffle. Every row of a group's global top-k is in its
  *    partition's top-k, so pruning to k per (partition, group) is lossless
  *    (the same argument as partial aggregation).
  *  - exchange: hash on the group keys — inserted automatically by
  *    EnsureRequirements from `requiredChildDistribution`, so AQE still
  *    owns partition-count decisions. The shuffle carries at most
  *    k · groups · partitions rows instead of all n.
  *  - final pass (reduce side): re-heap the ≤ k·partitions candidates per
  *    group, then sort just those k and emit with a `rank` column (1..k).
  *
  * At 100 TB this turns "shuffle + sort the corpus" into "shuffle k rows
  * per group per input split" — the shuffle volume drops by ~n/(k·groups)
  * and the per-group sort never materializes more than k·splits rows.
  */
case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    rankAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

/** Plans [[TopKPerGroupPlan]] as partial-exec → (exchange) → final-exec.
  * The exchange itself is not planned here: the final exec declares
  * `ClusteredDistribution(groupExprs)` and EnsureRequirements inserts the
  * hash exchange exactly like it does between partial and final aggregates.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, so, k, rank, child) =>
      val partial = TopKPerGroupExec(g, so, k, rankAttr = None, planLater(child))
      TopKPerGroupExec(g, so, k, rankAttr = Some(rank), partial) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap top-k per group. `rankAttr = None` is the partial
  * (map-side) form: prune each input partition to k rows per group, any
  * output order, no distribution requirement. `rankAttr = Some(_)` is the
  * final form: requires clustering on the group keys, merges the per-split
  * candidates and emits each group's k rows in sort order with a 1-based
  * rank column.
  */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    rankAttr: Option[AttributeReference],
    child: SparkPlan) extends UnaryExecNode {

  private def isFinal: Boolean = rankAttr.isDefined

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override def requiredChildDistribution: Seq[Distribution] =
    if (isFinal) ClusteredDistribution(groupExprs) :: Nil
    else UnspecifiedDistribution :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
  override def nodeName: String =
    if (isFinal) "TopKPerGroupFinal" else "TopKPerGroupPartial"

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val gExprs = groupExprs
    val order = sortOrder
    val kk = k
    val fin = isFinal
    val outAttrs = output
    child.execute().mapPartitions({ iter =>
      // projections/orderings are codegen'd per partition on the executor —
      // never serialized from the driver
      val keyProj = UnsafeProjection.create(gExprs, childOutput)
      val rowProj = UnsafeProjection.create(childOutput, childOutput)
      val ord = RowOrdering.create(order, childOutput)
      // keep each group's k smallest-in-sort-order rows in a max-heap
      // (reversed comparator): the root is the worst row kept, evicted as
      // soon as a better one arrives
      val revOrd = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = rowProj(iter.next()) // single reused buffer; copy before storing
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          // initial capacity bounded: PriorityQueue preallocates its array,
          // so seeding every group with k slots would make memory O(groups·k)
          // even for tiny groups (and k+1 overflows at Int.MaxValue); the
          // queue grows on demand toward k
          heap = new java.util.PriorityQueue[UnsafeRow](math.min(kk, 16) + 1, revOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) { heap.poll(); heap.add(row.copy()) }
      }
      if (!fin) {
        heaps.values.iterator.asScala.flatMap(_.iterator.asScala)
      } else {
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        // rank column type follows the attribute: LongType from the facade,
        // IntegerType when substituting for a rewritten row_number()
        val rankIsLong = rankAttr.get.dataType == org.apache.spark.sql.types.LongType
        heaps.values.iterator.asScala.flatMap { heap =>
          val rows = heap.toArray(new Array[UnsafeRow](heap.size))
          java.util.Arrays.sort(rows, ord)
          Iterator.tabulate(rows.length) { i =>
            if (rankIsLong) rankRow.setLong(0, i + 1L) else rankRow.setInt(0, i + 1)
            outProj(joined(rows(i), rankRow)).copy()
          }
        }
      }
    }, preservesPartitioning = true)
  }
}

/** DataFrame-facing facade. Resolves the group/sort columns against the
  * child's analyzed output, registers the planner strategy on the session
  * (idempotent — `experimental.extraStrategies` works on any session, no
  * `--conf spark.sql.extensions` needed), and wraps the custom node back
  * into a DataFrame.
  */
object TopK {

  /** Register the planner strategy on the session (idempotent). */
  private[plans] def installStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.exists(_ eq TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }

  /** Install the strategy AND the declarative-rewrite rule
    * ([[RowNumberTopKRule]]) on a session, idempotently: afterwards the
    * plain `row_number().over(...).filter(rn <= k)` idiom plans through
    * [[TopKPerGroupExec]] automatically — no facade call needed. The same
    * pair is registered globally by `GraftExtensions` for sessions built
    * with `spark.sql.extensions`.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    installStrategy(spark)
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RowNumberTopKRule])) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new RowNumberTopKRule
    }
  }

  /** Top `k` rows of each group under `sortSpec` (column name → ascending?),
    * with a 1-based `rank` long column. `sortSpec` should be a total order
    * within each group (include a unique tiebreaker) for deterministic
    * output — same contract as any top-k.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], sortSpec: Seq[(String, Boolean)],
               k: Int, rankName: String = "rn"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty && sortSpec.nonEmpty, "group and sort columns are required")
    val spark = df.sparkSession
    installStrategy(spark)
    val lp = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      lp.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column '$name' not in ${lp.output.map(_.name).mkString("[", ", ", "]")}"))
    val g = groupCols.map(attr)
    val so = sortSpec.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val rank = AttributeReference(rankName, LongType, nullable = false)()
    GraftSqlBridge.ofRows(spark, TopKPerGroupPlan(g, so, k, rank, lp))
  }
}
