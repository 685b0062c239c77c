package graft.plans

import java.util.IdentityHashMap

import org.apache.spark.sql.catalyst.expressions.PredicateHelper
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.StreamingDataSourceV2ScanRelation
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.sources

import graft.sources.TxLogMicroBatchStream

/** Streaming plans get no V2ScanRelationPushDown, so a filtered
  * `spark.readStream.table("graft.ns.t")` would open every file of every
  * micro-batch window — the same gap the v1 side's
  * [[PushFiltersIntoGraftScan]] closes for `GraftScan` leaves, here for
  * the v2 [[TxLogMicroBatchStream]]. The rule OBSERVES (never rewrites):
  * translatable conjuncts of Filters directly above the stream's scan
  * relations are handed to the stream, which folds them into every
  * batch's manifest pruning and per-file reader. The optimizer runs
  * before each micro-batch's partition planning, so the push lands in
  * time; the plan's own Filter still evaluates above — superset
  * contract, rows bit-identical.
  *
  * One stream object can back SEVERAL relation occurrences (a self-union
  * / self-join re-reads the same source), and file pruning happens in
  * the SHARED stream — so only conjuncts present above EVERY occurrence
  * are pushed: pruning by one branch's filter would silently drop rows
  * the other branch needs. An occurrence with no adjacent Filter (or an
  * untranslatable one) makes the intersection empty — unpruned, still
  * exact. */
object PushFiltersIntoTxLogStream extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // pass 1: conjunct sets of relations sitting DIRECTLY under a Filter
    val guarded = new IdentityHashMap[LogicalPlan, Unit]()
    val sets = scala.collection.mutable.Map
      .empty[TxLogMicroBatchStream, List[Set[sources.Filter]]]
    def add(s: TxLogMicroBatchStream, fs: Set[sources.Filter]): Unit =
      sets.update(s, fs :: sets.getOrElse(s, Nil))
    plan.foreach {
      case f: Filter => f.child match {
        case r: StreamingDataSourceV2ScanRelation => r.stream match {
          case s: TxLogMicroBatchStream =>
            guarded.put(r, ())
            add(s, splitConjunctivePredicates(f.condition)
              .flatMap(PlanBridge.translateFilter).toSet)
          case _ => ()
        }
        case _ => ()
      }
      case _ => ()
    }
    // pass 2: bare occurrences contribute the empty set (push nothing)
    plan.foreach {
      case r: StreamingDataSourceV2ScanRelation if !guarded.containsKey(r) =>
        r.stream match {
          case s: TxLogMicroBatchStream => add(s, Set.empty)
          case _ => ()
        }
      case _ => ()
    }
    sets.foreach { case (stream, occ) =>
      stream.pushStatic(occ.reduce(_ intersect _).toSeq)
    }
    plan
  }
}
