package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Pre-wired [[SparkSessionExtensions]] hook (SURVEY.md §4).
  *
  * Q01–Q35 need no custom Catalyst rules — the declared surface is fully
  * served by built-in rewrites (pushdown, pruning, join selection, two-phase
  * agg, TakeOrderedAndProject). This class exists so a future rule or
  * planner strategy (e.g. event-type filter pushdown into the CDC source,
  * or a dedicated ANN search strategy) has a registration point without
  * touching every session construction site.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Intentionally empty: no-op by default. Inject rules here, e.g.
    //   ext.injectOptimizerRule(session => MyRule(session))
    //   ext.injectPlannerStrategy(session => MyStrategy(session))
  }
}
