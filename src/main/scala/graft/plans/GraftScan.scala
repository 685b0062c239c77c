package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.sources

/** Filter pushdown from the STREAMING query plan into graft's v1
  * sources (SURVEY §4's promised Catalyst hook, made real).
  *
  * A v1 `Source.getBatch` never sees the query plan: the micro-batch
  * planner splices whatever DataFrame it returns under the query's
  * operators, so a `.filter(...)` in the streaming query runs AFTER the
  * source has already read every shard record / zone file of the batch
  * window. At 100 TB that inverts the economics of the lake: the
  * manifest and the shard cursors know exactly which units a predicate
  * can touch, but the plan boundary hides the predicate.
  *
  * The hook closes that boundary with the standard custom-operator kit:
  *
  *  - sources return a [[GraftScan]] LEAF (streaming) from getBatch,
  *    carrying a [[PrunableScan]] — the unit-pruning capability (shard
  *    specs, stats-tracked files) without any plan machinery;
  *  - [[PushFiltersIntoGraftScan]] (injected optimizer rule) finds
  *    `Filter` directly above the leaf — the built-in PushDownPredicates
  *    has already moved it through the splice's Project — translates the
  *    conjuncts through Spark's own catalyst→`sources.Filter` path, and
  *    records the ones the scan [[PrunableScan.accepts]];
  *  - [[GraftScanStrategy]] (injected planner strategy) plans the leaf
  *    into [[GraftScanExec]], whose doExecute asks the scan for the RDD
  *    of only the matching units.
  *
  * Pruning is a SUPERSET contract (exactly parquet's PushedFilters): the
  * original Filter stays in the plan, so a pushed predicate can only
  * skip units that provably contain no qualifying row — results are
  * bit-identical with and without the hook. */
trait PrunableScan {

  /** Can this scan use `f` to skip whole units (shards / files)?
    * Only `accept`ed filters are recorded on the plan and passed to
    * [[buildRDD]]; everything else stays Filter-only. */
  def accepts(f: sources.Filter): Boolean

  /** The batch's rows, reading only units that can match `pushed`
    * (`pushed` is empty for an unfiltered stream). Rows must follow the
    * owning [[GraftScan]]'s output order. `onPrune` is invoked once,
    * driver-side, with (units served, units total) for the batch window
    * — [[GraftScanExec]] feeds it into its SQLMetrics so the skip is
    * visible in the Spark UI, not just the dev probe. */
  def buildRDD(pushed: Seq[sources.Filter],
               onPrune: (Long, Long) => Unit): RDD[InternalRow]

  /** Report-free convenience for fallback paths and specs. */
  final def buildRDD(pushed: Seq[sources.Filter]): RDD[InternalRow] =
    buildRDD(pushed, (_, _) => ())

  /** A copy of this scan serving ONLY `cols` (in that order), or None
    * when the scan cannot narrow (the default — e.g. a fixed-record
    * transport where all columns ride together anyway). Lets
    * [[PruneGraftScanColumns]] reach parquet column pruning through the
    * streaming boundary: a consumer selecting 2 of a wide zone's 40
    * columns should read 2 columns' pages, not 40. */
  def withRequiredColumns(cols: Seq[String]): Option[PrunableScan] = None

  /** A copy of this scan serving AT LEAST `n` rows (all rows when fewer
    * exist) while reading fewer units, or None when the scan cannot cap
    * (the default). Contract is best-effort SUPERSET: the plan's Limit
    * still trims above, so serving more than `n` is always sound —
    * serving fewer than min(n, available) never is. Lets
    * [[PushLimitIntoGraftScan]] keep a `.limit(5)` preview consumer from
    * reading a whole 100 TB batch window. */
  def withLimit(n: Int): Option[PrunableScan] = None

  /** Short scan identity for explain output. */
  def describe: String
}

/** Streaming leaf carrying a prunable source batch; `pushed` is filled
  * in by [[PushFiltersIntoGraftScan]], `cappedAt` by
  * [[PushLimitIntoGraftScan]] (the folded row cap, recorded so the
  * fixpoint only re-folds a strictly tighter limit). */
case class GraftScan(output: Seq[Attribute], scan: PrunableScan,
                     pushed: Seq[sources.Filter] = Nil,
                     cappedAt: Option[Int] = None) extends LeafNode {
  override def isStreaming: Boolean = true
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = conf.defaultSizeInBytes)
  override def simpleString(maxFields: Int): String =
    s"GraftScan ${scan.describe}${
      if (pushed.isEmpty) "" else s", PushedFilters: [${pushed.mkString(", ")}]"}${
      cappedAt.fold("")(n => s", Limit: $n")}"
}

/** Optimizer rule: fold the conjuncts of a Filter sitting directly on a
  * [[GraftScan]] into the scan (keeping the Filter — superset
  * semantics). Runs in the operator-optimization fixpoint, so built-in
  * predicate pushdown has already moved eligible filters adjacent to
  * the leaf. The push is MONOTONIC (set-union, no-op when nothing new),
  * so stacked filters that CombineFilters merges in a later fixpoint
  * pass still contribute their conjuncts, and the fixpoint terminates
  * (pushed only grows, bounded by the conjunct count). */
object PushFiltersIntoGraftScan extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, g: GraftScan) =>
      val usable = splitConjunctivePredicates(cond)
        .filter(_.deterministic)
        .flatMap(PlanBridge.translateFilter)
        .filter(g.scan.accepts)
      if (usable.toSet.subsetOf(g.pushed.toSet)) f
      else f.copy(child = g.copy(pushed = (g.pushed ++ usable).distinct))
  }
}

/** Optimizer rule: fold a `LocalLimit` sitting directly on a
  * [[GraftScan]] into the scan — a `.limit(5)` preview/debug consumer
  * of a stream then reads ~5 rows' worth of units instead of the whole
  * batch window. The LocalLimit STAYS above (superset contract: the
  * scan may serve more than n; the plan trims exactly). Fires only on
  * the bare limit-over-scan shape: Catalyst never pushes a Limit below
  * a Filter, so a capped scan can never carry row-discarding pushed
  * predicates whose selectivity would break the at-least-n contract
  * (belt-and-braces for that invariant lives in the scan impls too).
  * Terminates: re-folds only a strictly tighter cap. */
object PushLimitIntoGraftScan extends Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.IntegerLiteral
  import org.apache.spark.sql.catalyst.plans.logical.LocalLimit

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case l @ LocalLimit(IntegerLiteral(n), g: GraftScan)
        if g.pushed.isEmpty && n >= 0 && g.cappedAt.forall(n < _) =>
      g.scan.withLimit(n)
        .map(s => l.copy(child = g.copy(scan = s, cappedAt = Some(n))))
        .getOrElse(l)
  }
}

/** Optimizer rule: narrow a [[GraftScan]] to the columns the plan above
  * actually reads. Catalyst's ColumnPruning stops at leaf nodes — it
  * leaves `Project(needed, leaf)` in place — so without this rule the
  * scan still materializes every column (and the txlog scan's nested
  * parquet read fetches every column's pages). The rewrite keeps the
  * surviving attributes' exprIds (resolution is untouched) and asks the
  * scan for a narrowed copy; scans that cannot narrow decline and the
  * Project stays as-is. A no-reference Project (count(*) shape) keeps
  * one column — a zero-arity row is not expressible through the read. */
object PruneGraftScanColumns extends Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  /** Narrow `g` to the attributes in `required`, or None if nothing to
    * do / the scan declines. */
  private def narrowed(g: GraftScan, required: AttributeSet): Option[GraftScan] = {
    val needed0 = g.output.filter(required.contains)
    // a no-reference parent (count(*) shape) still needs arity >= 1
    val needed = if (needed0.isEmpty) g.output.take(1) else needed0
    if (needed.size == g.output.size) None
    else g.scan.withRequiredColumns(needed.map(_.name))
      .map(n => g.copy(output = needed, scan = n))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, g: GraftScan) if g.output.size > 1 =>
      narrowed(g, p.references).map(n => p.copy(child = n)).getOrElse(p)
    // the filtered shape is matched whole: letting ColumnPruning insert
    // a Project below the Filter instead oscillates with
    // PushDownPredicates + CollapseProject and never settles on the leaf
    case p @ Project(_, f @ Filter(cond, g: GraftScan)) if g.output.size > 1 =>
      narrowed(g, p.references ++ cond.references)
        .map(n => p.copy(child = f.copy(child = n))).getOrElse(p)
  }
}

/** Plans [[GraftScan]] — the only custom strategy this engine needs. */
object GraftScanStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case g: GraftScan => GraftScanExec(g.output, g.scan, g.pushed) :: Nil
    case _            => Nil
  }

  /** Is the strategy registered in this session? Sources fall back to
    * the plain bridged-RDD batch (correct, just unpruned) when a
    * vanilla session without [[GraftExtensions]] drives them — a
    * GraftScan leaf the planner cannot plan would otherwise fail every
    * micro-batch. The planner peek goes through an internal class
    * (`classic.SparkSession`), so it is wrapped: if a Spark bump moves
    * that class, every source degrades to the UNPRUNED fallback (slower,
    * still correct) instead of failing each micro-batch on a cast. */
  def registeredIn(spark: org.apache.spark.sql.SparkSession): Boolean =
    scala.util.Try(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.planner.strategies.exists(_ eq this)
    ).getOrElse(false)
}

case class GraftScanExec(output: Seq[Attribute], scan: PrunableScan,
                         pushed: Seq[sources.Filter]) extends LeafExecNode {

  import org.apache.spark.sql.execution.SQLExecution
  import org.apache.spark.sql.execution.metric.SQLMetrics

  /** The pruning's production observability (round-9 directive: the
    * spec-only LWW [[PushdownProbe]] is not a metrics API): units =
    * shard windows / zone files in the batch window vs actually served;
    * columns = the leaf's (possibly narrowed) output arity. Driver-set
    * metrics are posted explicitly so the Spark UI's SQL tab shows them
    * on the scan node of every micro-batch. */
  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "unitsServed" -> SQLMetrics.createMetric(sparkContext, "scan units served"),
    "unitsTotal" -> SQLMetrics.createMetric(sparkContext, "scan units in batch window"),
    "columnsServed" -> SQLMetrics.createMetric(sparkContext, "columns served"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val unitsServed = longMetric("unitsServed")
    val unitsTotal = longMetric("unitsTotal")
    val columnsServed = longMetric("columnsServed")
    columnsServed.set(output.size.toLong)
    val rdd = scan.buildRDD(pushed, (served, total) => {
      unitsServed.set(served)
      unitsTotal.set(total)
      val execId = sparkContext.getLocalProperty(SQLExecution.EXECUTION_ID_KEY)
      SQLMetrics.postDriverMetricUpdates(sparkContext, execId,
        Seq(unitsServed, unitsTotal, columnsServed))
    })
    rdd.mapPartitions { it =>
      it.map { r => numOutputRows += 1; r }
    }
  }

  override def simpleString(maxFields: Int): String =
    s"GraftScanExec ${scan.describe}${
      if (pushed.isEmpty) "" else s", PushedFilters: [${pushed.mkString(", ")}]"}"
}

/** Dev/test introspection: each scan records (units served, units
  * total) per probe key at buildRDD time, so specs can assert the
  * pruned stream genuinely read less. LAST-WRITE-WINS per key (the key
  * is the store/zone path): a reader that needs a specific scan's
  * numbers must run it sequentially and read the probe before the next
  * scan of the same store fires — fine for specs, not a metrics API.
  * Not part of the engine contract — production observability is
  * [[GraftScanExec]]'s SQLMetrics (unitsServed/unitsTotal/columnsServed/
  * numOutputRows in the Spark UI's SQL tab). */
object PushdownProbe {
  private val log =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
  private val cols =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
  def record(key: String, served: Long, total: Long): Unit =
    log.put(key, (served, total))
  def recordCols(key: String, served: Seq[String]): Unit =
    cols.put(key, served)
  def get(key: String): Option[(Long, Long)] = Option(log.get(key))
  def getCols(key: String): Option[Seq[String]] = Option(cols.get(key))
  /** Spec-side reset, so "no record after this point" can assert a scan
    * NEVER ran (the manifest-served COUNT path). */
  def clear(key: String): Unit = { log.remove(key); cols.remove(key): Unit }
}
