package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN as a first-class operator — the canonical "operator Spark
  * SQL lacks" (DuckDB ships `ASOF JOIN`; pandas has `merge_asof`;
  * Spark has neither): for every left row, attach the right row with
  * the same key and the GREATEST right time ≤ the left time, or nulls
  * when no right row precedes it. The reference's point-in-time
  * queries (`/root/reference/README.md:573-589` pairs AS-OF reads with
  * change windows) compose this shape; q17 emulates one as-of lookup
  * with an interval self-join, which needs the dimension pre-built
  * into [from, to) epochs. This operator needs no interval table — it
  * IS the lookup.
  *
  * Built exactly along SURVEY §7.3's preference ladder, tier (c): a
  * custom `LogicalPlan` ([[AsOfJoinPlan]]) + `SparkStrategy`
  * ([[AsOfJoinStrategy]], injected via `SparkSessionExtensions
  * .injectPlannerStrategy` / `experimental.extraStrategies`) + a
  * `SparkPlan` ([[AsOfJoinExec]]) that declares its distribution and
  * ordering requirements and lets EnsureRequirements plan the
  * exchanges.
  *
  * 100 TB shape — this is the whole point of doing it as a physical
  * operator instead of composing joins: both sides shuffle ONCE on the
  * key (declared `ClusteredDistribution`, so co-partitioning is
  * planner-guaranteed), sort within partitions on (key, time) (declared
  * `requiredChildOrdering`, so Spark plans the sorts and can satisfy
  * them from bucketed/sorted sources for free), and then a single
  * forward merge pass emits every match — O(|L| + |R|) per partition,
  * zero buffering beyond ONE retained right row. The window-function
  * emulation (union both sides, lag over (key, time), filter) costs
  * the same shuffle but carries both tables through one window
  * partition stream and materializes rank state; the interval-join
  * emulation (q17) needs the extra self-join to build epochs. The
  * merge also never expands rows (left outer cardinality is exactly
  * |L|), so no join-explosion skew exists by construction.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute) extends BinaryNode {
  require(
    Seq(leftKey, leftTime, rightKey, rightTime).forall(_.dataType == LongType),
    "as-of key/time columns must be LONG (cast timestamps to unix micros)")

  /** Left-outer semantics: right columns become nullable. */
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule: the logical as-of node has exactly one physical
  * implementation. `planLater` keeps child planning with Catalyst. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(lk, lt, rk, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned, co-sorted, single-pass merge.
  *
  * Correctness of the merge: both inputs arrive sorted by (key, time)
  * ascending (declared, so guaranteed by EnsureRequirements). The right
  * cursor advances while its (key, time) ≤ the current left (key, time)
  * in that order, retaining the last row consumed; because the left
  * side is also sorted, the retained row is exactly the
  * greatest-time-≤ match once keys line up, and no later left row ever
  * needs a right row that was passed over. Right rows with null
  * key/time are skipped (SQL semantics: null never equals a key);
  * null-keyed left rows emit null extensions.
  */
case class AsOfJoinExec(
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Standard exec observability: output cardinality is |L| by
    * construction, so the interesting number is how many rows actually
    * found a match. */
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" ->
      SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" ->
      SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** The merge preserves the left side's partitioning and ordering —
    * declaring both lets downstream aggs/joins on the same key reuse
    * the exchange and skip a re-sort. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    // bind with the static type Expression: bindReference casts its
    // result back to the input's type, and a bound Attribute becomes a
    // BoundReference (not an Attribute)
    val lKeyB = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTimeB = BindReferences.bindReference(leftTime: Expression, left.output)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTimeB =
      BindReferences.bindReference(rightTime: Expression, right.output)
    val nRightFields = right.output.size
    val outAttrs = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullRight = new GenericInternalRow(nRightFields)
      val joined = new JoinedRow
      new Iterator[InternalRow] {
        // lookahead right row (not yet consumed into `last`)
        private var rRow: InternalRow = _
        private var rKeyV = 0L
        private var rTimeV = 0L
        private var haveR = advanceRight()
        // last right row consumed by the cursor + its key
        private var lastRow: InternalRow = _
        private var lastKey = 0L

        private def advanceRight(): Boolean = {
          while (ri.hasNext) {
            val r = ri.next()
            val k = rKeyB.eval(r)
            val t = rTimeB.eval(r)
            if (k != null && t != null) {
              rRow = r
              rKeyV = k.asInstanceOf[Long]
              rTimeV = t.asInstanceOf[Long]
              return true
            }
          }
          rRow = null
          false
        }

        override def hasNext: Boolean = li.hasNext

        override def next(): InternalRow = {
          val l = li.next()
          numOutputRows += 1
          val kAny = lKeyB.eval(l)
          val tAny = lTimeB.eval(l)
          if (kAny == null || tAny == null) return proj(joined(l, nullRight))
          val lk = kAny.asInstanceOf[Long]
          val lt = tAny.asInstanceOf[Long]
          while (haveR && (rKeyV < lk || (rKeyV == lk && rTimeV <= lt))) {
            // copy: the iterator may reuse its UnsafeRow buffer
            lastRow = rRow.copy()
            lastKey = rKeyV
            haveR = advanceRight()
          }
          if (lastRow != null && lastKey == lk) {
            numMatchedRows += 1
            proj(joined(l, lastRow))
          } else proj(joined(l, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public entry: `AsOfJoin(left, "k", "t", right, "rk", "rt")`.
  * Sides must not share column names (rename the right side — aliases
  * also give its attributes fresh expression ids, which keeps a
  * self-as-of-join, both sides carved from one table, unambiguous). */
object AsOfJoin {
  def apply(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"as-of $side column '$n' not in ${p.output.map(_.name)}"))
    val overlap =
      lPlan.output.map(_.name).toSet intersect rPlan.output.map(_.name).toSet
    require(overlap.isEmpty,
      s"as-of join sides share column names: $overlap — rename one side")
    org.apache.spark.sql.graft.ColumnBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, leftKey, "left"), attr(lPlan, leftTime, "left"),
        attr(rPlan, rightKey, "right"), attr(rPlan, rightTime, "right")))
  }
}
