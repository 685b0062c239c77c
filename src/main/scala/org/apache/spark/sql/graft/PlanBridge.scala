package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.sources.Filter

/** Bridge into `private[sql]` plan construction and filter translation
  * (same extension-library pattern as [[StreamBridge]]; no Spark
  * internals are modified).
  *
  *  - [[dataFrame]] wraps a custom logical plan as a DataFrame — the
  *    only way a v1 streaming Source can hand the micro-batch planner a
  *    custom leaf (so that session extensions can push query-plan
  *    filters INTO the source's scan).
  *  - [[translateFilter]] is Spark's own catalyst→public-Filter
  *    translation (the one every DSv1 relation pushdown goes through),
  *    reused so graft scans speak the stable
  *    `org.apache.spark.sql.sources.Filter` vocabulary instead of
  *    re-implementing expression matching. */
object PlanBridge {

  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def translateFilter(e: Expression): Option[Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = false)

  /** The session's REGISTERED (and cached) catalog instance — the same
    * object SELECT resolves through, so maintenance statements and
    * queries can never disagree about where a table lives (a conf
    * changed after first use affects neither). */
  def catalogPlugin(spark: SparkSession, name: String)
      : org.apache.spark.sql.connector.catalog.CatalogPlugin =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager.catalog(name)
}
