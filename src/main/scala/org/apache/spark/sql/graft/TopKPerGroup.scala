package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension demo completing the SURVEY §4 preference
  * ladder's option (c): a custom `LogicalPlan` node + `SparkStrategy` +
  * `SparkPlan`, registered through `SparkSessionExtensions`
  * ([[graft.GraftExtensions]]) — for semantics the built-in operators
  * express only wastefully.
  *
  * The semantics: the top-k rows of each group under an ordering — the
  * pattern every batched ANN ranking (s5/s6/s10) and stratified sample
  * leans on. Spark's spellable form,
  * `row_number().over(partitionBy(g).orderBy(o)) <= k`, SORTS every
  * group in full: the WindowExec pipeline is exchange -> per-partition
  * SORT of all rows -> rank -> filter, paying O(n log n) comparisons
  * and materializing the sort buffer even though only k rows per group
  * survive. (The repo's t12 salting bounds the sort's PARTITION size;
  * it cannot remove the sort itself.)
  *
  * [[TopKPerGroupExec]] replaces sort-rank-filter with one pass of
  * bounded per-group HEAPS: `requiredChildDistribution` asks Catalyst
  * for clustering on the group keys (the planner inserts the same hash
  * exchange the window needed — no extra shuffle, and
  * `outputPartitioning` re-exposes the child's, so a downstream
  * same-key aggregation adds none either), then each partition streams
  * its rows once, keeping a size-k binary heap per group — O(n log k)
  * comparisons, memory O(groups x k) instead of the full partition, no
  * sort buffer. The ordering comparator is the same
  * whole-stage-generated `BaseOrdering` Spark's own SortExec uses.
  *
  * Contract and limits:
  *  - output is the top-k SET per group, in no particular order
  *    (callers ordering their final result — every oracle query here
  *    does — pay a sort over g x k rows, not over n);
  *  - ties at the k-th position break by the ordering itself, so
  *    callers make the ordering TOTAL (append a unique id — the
  *    repo-wide tie discipline);
  *  - heap state lives OUTSIDE Spark's task memory manager and cannot
  *    spill — the win over the window is exactly that nothing
  *    partition-sized is buffered, which inverts when groups x k
  *    approaches partition size. `maxGroupsPerPartition` is the
  *    DEGRADE threshold for that case (a near-unique group key): on
  *    breach the partition falls back to a spillable sort-based pass
  *    (Spark's own ExternalSorter on (group, order), then stream the
  *    first k of each group run) — the window's cost model, paid only
  *    by partitions that actually need it, so a cardinality surprise
  *    at scale costs performance, not the job. The fallback is exact:
  *    any row evicted or rejected by the heaps before the breach is
  *    dominated by k better same-group rows that are still held, so
  *    (heap contents ++ remaining input) ⊇ every group's true top-k;
  *  - float/double group keys are bit-normalized (-0.0 == 0.0, one
  *    NaN) like Aggregate/Window keys — the analyzer's
  *    NormalizeFloatingNumbers rule does not descend into custom
  *    nodes, so the Column API applies the same normalization itself.
  */
case class TopKPerGroupNode(k: Int, groupExprs: Seq[Expression],
    order: Seq[SortOrder], child: LogicalPlan,
    maxGroupsPerPartition: Long) extends UnaryNode {
  require(k > 0, s"topKPerGroup needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Plans [[TopKPerGroupNode]] onto [[TopKPerGroupExec]]; injected via
  * [[graft.GraftExtensions]] and self-registered by [[TopKPerGroup]]'s
  * Column API for sessions built without the extension. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(k, g, o, child, maxGroups) =>
      TopKPerGroupExec(k, g, o, planLater(child), maxGroups) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(k: Int, groupExprs: Seq[Expression],
    order: Seq[SortOrder], child: SparkPlan,
    maxGroupsPerPartition: Long) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // the planner satisfies this with a hash exchange on the group keys —
  // the exact distribution the equivalent window formulation shuffles
  // for, so the heap pass adds NO exchange of its own...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  // ...and per-partition filtering preserves the child's partitioning,
  // so a downstream same-key aggregation adds no second exchange
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitionsInternal { iter =>
      val groupProj = UnsafeProjection.create(groupExprs, child.output)
      val ord = GenerateOrdering.generate(order, child.output)
      // per-group REVERSE-ordered heap: the head is the WORST kept row,
      // so admission is one compare against the head
      val revCmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      var breachRow: InternalRow = null
      while (breachRow == null && iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= maxGroupsPerPartition) {
            // group cardinality outgrew the unspillable heap budget:
            // hand the partition to the sort-based fallback below
            breachRow = row.copy()
          } else {
            // capacity grows on demand: a huge k must not preallocate a
            // k-element array for every small group
            heap = new java.util.PriorityQueue[InternalRow](
              math.min(k, 16), revCmp)
            heaps.put(key.copy(), heap) // the projection reuses its buffer
          }
        }
        if (heap != null) {
          if (heap.size() < k) heap.add(row.copy())
          else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy())
          }
        }
      }
      import scala.jdk.CollectionConverters._
      if (breachRow == null)
        heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
      else
        sortBasedFallback(
          owned = heaps.values().iterator().asScala
            .flatMap(_.iterator().asScala) ++ Iterator.single(breachRow),
          unowned = iter, k)
    }

  /** Spillable degrade for a partition whose group count breached
    * `maxGroupsPerPartition`: external-sort everything still held (heap
    * contents — all private copies — plus the unread remainder) by
    * (group, order) through Spark's own ExternalSorter, then stream the
    * first k rows of each group run. Exact (see class doc), O(k) JVM
    * memory beyond the sorter's managed, spill-capable buffer — the
    * same cost model as the window formulation, paid per offending
    * partition instead of by the whole plan.
    */
  private def sortBasedFallback(owned: Iterator[InternalRow],
      unowned: Iterator[InternalRow], k: Int): Iterator[InternalRow] = {
    logWarning(s"topKPerGroup: partition exceeded $maxGroupsPerPartition " +
      "groups; degrading to the spillable sort-based pass (exact result, " +
      "window-formulation cost). Raise maxGroupsPerPartition if the " +
      "memory budget allows keeping the heap pass.")
    val groupOrders = groupExprs.map(SortOrder(_, Ascending))
    val fullOrd = GenerateOrdering.generate(groupOrders ++ order, child.output)
    val groupOrd = GenerateOrdering.generate(groupOrders, child.output)
    val sortKeyOrd = new Ordering[UnsafeRow] {
      override def compare(a: UnsafeRow, b: UnsafeRow): Int =
        fullOrd.compare(a, b)
    }
    // inside doExecute partitions a TaskContext always exists;
    // ExternalSorter dereferences it for the task memory manager, so
    // fail loudly here rather than NPE inside the sorter constructor
    val ctx = org.apache.spark.TaskContext.get()
    require(ctx != null,
      "topKPerGroup sort fallback requires an active TaskContext")
    val sorter = new org.apache.spark.util.collection.ExternalSorter[
      UnsafeRow, Boolean, Boolean](ctx, None, None, Some(sortKeyOrd))
    // CompletionIterator alone leaks spill files when a downstream
    // operator stops consuming early (e.g. a LocalLimit) — the task
    // listener is the cleanup that always runs (Spark's own sorter
    // call sites pair both)
    ctx.addTaskCompletionListener[Unit](_ => sorter.stop())
    // the sorter holds references until spill/sort, so every row it
    // sees must be privately owned: heap contents already are (the heap
    // path copies on admission); remainder rows come straight off the
    // child iterator, which reuses its row buffer — convert + copy
    val toUnsafe = UnsafeProjection.create(child.output, child.output)
    sorter.insertAll(
      (owned.map { case u: UnsafeRow => u; case r => toUnsafe(r).copy() } ++
        unowned.map(r => toUnsafe(r).copy())).map((_, true)))
    var prev: InternalRow = null
    var seen = 0L
    val topK = sorter.iterator.map(_._1).filter { r =>
      if (prev == null || groupOrd.compare(prev, r) != 0) {
        prev = r // sorter rows are owned copies — safe to hold across next()
        seen = 0L
      }
      seen += 1
      seen <= k
    }
    org.apache.spark.util.CompletionIterator[InternalRow,
      Iterator[InternalRow]](topK, sorter.stop())
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroup {

  /** DataFrame-level entry point: the top-k rows of each `groupCols`
    * group under `orderCols` (plain columns default ascending; pass
    * `col.desc`/`col.asc` forms for explicit direction). Registers the
    * planner strategy into the session on first use when neither the
    * `graft.GraftExtensions` config nor a prior call already has.
    */
  def apply(df: DataFrame, k: Int, groupCols: Seq[Column],
      orderCols: Seq[Column],
      maxGroupsPerPartition: Long = 1L << 22): DataFrame = {
    // an empty group list would reach ClusteredDistribution(Nil) and
    // surface as a Spark-internal require crash at planning; the
    // global-top-k ask it implies is orderBy(o).limit(k), which Spark
    // already plans as TakeOrderedAndProject — point there by name
    require(groupCols.nonEmpty,
      "topKPerGroup needs at least one group column; for a GLOBAL top-k " +
        "use df.orderBy(...).limit(k) (planned as TakeOrderedAndProject)")
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
    val spark = ds.sparkSession
    // the extensions path injects into the session planner, NOT into
    // experimental.extraStrategies — consult the planner's full
    // strategy list so such sessions don't get a second copy
    this.synchronized {
      if (!spark.sessionState.planner.strategies.contains(TopKPerGroupStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val child = ds.queryExecution.analyzed
    // the analyzer's generic resolution does not descend into custom
    // nodes, so expressions are resolved HERE against the analyzed
    // child's output (single-part names — this operator keys on plain
    // columns of `df`, the repo-wide convention); ambiguous names fail
    // loudly like the analyzer would
    val resolver = spark.sessionState.analyzer.resolver
    def resolved(c: Column): Expression =
      spark.expression(c).transformUp {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          child.output.filter(a => resolver(a.name, u.name)) match {
            case Seq(one) => one
            case Seq() => throw new IllegalArgumentException(
              s"topKPerGroup: cannot resolve '${u.name}' against " +
                child.output.map(_.name).mkString("[", ", ", "]"))
            case many => throw new IllegalArgumentException(
              s"topKPerGroup: '${u.name}' is ambiguous — " +
                s"${many.size} columns match")
          }
      }
    // float keys group like Aggregate/Window keys (-0.0 == 0.0, one
    // NaN): the optimizer rule doing this for builtin nodes skips
    // custom ones, so normalize here
    val g = groupCols.map(resolved).map(NormalizeFloatingNumbers.normalize)
    val o = orderCols.map(c => resolved(c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    org.apache.spark.sql.classic.Dataset.ofRows(spark,
      TopKPerGroupNode(k, g, o, child, maxGroupsPerPartition))
  }
}
