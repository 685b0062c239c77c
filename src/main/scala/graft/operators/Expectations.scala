package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality assertions (the Deequ/expectations shape):
  * each check compiles to ONE aggregation over its table — completeness
  * and range checks are map-side sums of a violation indicator,
  * uniqueness is count-minus-distinct, referential integrity is an
  * anti-join count — and the report unions the 1-row results. Nothing
  * here collects data: a 100 TB table's check is the same scan-and-agg
  * any metric query is, and independent checks over the same table can
  * share one pass via `rowChecks`. */
object Expectations {

  /** One row per (name, violation predicate) pair, ALL computed in a
    * single scan of `df`: n_checked = rows, n_violations = rows where
    * the predicate holds. */
  def rowChecks(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "rowChecks needs at least one check")
    val aggs = count(lit(1)).cast("long").as("_ex_n") +:
      checks.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(pred, 1L).otherwise(0L)).cast("long").as(s"_ex_v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(explode(array(checks.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("check"), col("_ex_n").as("n_checked"),
          col(s"_ex_v$i").as("n_violations"))
      }: _*)).as("r"))
      .select("r.*")
  }

  /** Duplicate-key check: n_violations = rows beyond the first per key.
    * NOTE on NULLs: countDistinct skips tuples with any NULL component,
    * so EVERY row whose key contains a NULL counts as a violation here —
    * stricter than SQL UNIQUE-constraint semantics, where NULL-keyed rows
    * are exempt. Pair with a not-null rowCheck (or pre-filter NULL keys)
    * when the SQL behavior is wanted — same contract as referential(). */
  def unique(name: String, df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.agg(count(lit(1)).cast("long").as("n_checked"),
        (count(lit(1)) - countDistinct(keyCols.head, keyCols.tail: _*))
          .cast("long").as("n_violations"))
      .select(lit(name).as("check"), col("n_checked"), col("n_violations"))

  /** Referential-integrity check: child keys with no parent row. NOTE:
    * a NULL child key counts as an orphan here (the anti-join keeps it)
    * — stricter than SQL FK semantics, where NULL is exempt. Pair with
    * a not-null rowCheck when the distinction matters. */
  def referential(name: String, child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String): DataFrame = {
    // Alias the parent key before joining: with the common FK shape where
    // childKey and parentKey share a name (both "id"), an unqualified
    // col(parentKey) is ambiguous against the joined plan. The alias must
    // not itself collide with a child column, or the same ambiguity
    // returns under the fixed name.
    require(!child.columns.contains("_ex_pk"),
      "referential(): the child frame carries a column named '_ex_pk', " +
        "which collides with the internal parent-key alias — rename it " +
        "before the check")
    val orphans = child.join(
        parent.select(col(parentKey).as("_ex_pk")).distinct(),
        child(childKey) === col("_ex_pk"), "left_anti")
      .agg(count(lit(1)).cast("long").as("n_violations"))
    child.agg(count(lit(1)).cast("long").as("n_checked"))
      .crossJoin(broadcast(orphans))
      .select(lit(name).as("check"), col("n_checked"), col("n_violations"))
  }

  /** Union the check rows into the final report: (check, n_checked,
    * n_violations, passed), ordered by check name. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    checks.reduce(_ unionByName _)
      .withColumn("passed",
        when(col("n_violations") === 0L, 1L).otherwise(0L).cast("long"))
      .orderBy("check")
  }
}
