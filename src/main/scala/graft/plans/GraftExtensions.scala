package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** [[SparkSessionExtensions]] hook (SURVEY.md §4).
  *
  * The batch surface needs no custom Catalyst rules — it is fully served
  * by built-in rewrites (pushdown, pruning, join selection, two-phase
  * agg, TakeOrderedAndProject). What built-ins CANNOT do is push a
  * streaming query's filters into a v1 Source's getBatch — that is the
  * [[GraftScan]] kit registered here: an optimizer rule that folds
  * Filter conjuncts into the scan leaf (shard / stats-file pruning) and
  * the strategy that plans the leaf. See [[PushFiltersIntoGraftScan]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PushFiltersIntoGraftScan)
    ext.injectOptimizerRule(_ => PruneGraftScanColumns)
    ext.injectOptimizerRule(_ => PushLimitIntoGraftScan)
    ext.injectOptimizerRule(_ => PushFiltersIntoTxLogStream)
    ext.injectPlannerStrategy(_ => GraftScanStrategy)
    // maintenance-statement grammar (VACUUM / OPTIMIZE / RESTORE) — the
    // statements vanilla Spark has no words for; everything else
    // delegates to the session parser untouched
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}
