package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiler: per column, row count, null count, exact
  * distinct count, and numeric min/max — the data-QA summary a pipeline
  * runs on arrival (the engine-side answer to `SUMMARIZE`/`ANALYZE`
  * style profiling; the reference ships its lake with no profiling at
  * all).
  *
  * Shape: ONE aggregation over one scan computes every measure (the
  * multi-distinct expands to a grouping-id plan internally — still one
  * pass over the data), producing a single wide row that a bounded
  * stack/unpivot turns into one row per column. Nothing here is
  * per-row driver state; the output is |columns| rows.
  *
  * Determinism: counts are exact longs; min/max go through
  * `try_cast(double)` so non-numeric columns profile as null bounds
  * instead of failing under ANSI, and no engine-specific number-to-
  * string formatting ever enters the result. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val aggs: Seq[Column] = count(lit(1)).as("_n") +: cols.flatMap { c =>
      Seq(
        sum(col(c).isNull.cast("long")).as(s"_nulls_$c"),
        count_distinct(col(c)).as(s"_dist_$c"),
        min(expr(s"try_cast($c AS DOUBLE)")).as(s"_min_$c"),
        max(expr(s"try_cast($c AS DOUBLE)")).as(s"_max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("col_name"), col("_n").as("n_rows"),
        col(s"_nulls_$c").as("n_nulls"), col(s"_dist_$c").as("n_distinct"),
        col(s"_min_$c").as("min_num"), col(s"_max_$c").as("max_num"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }
}
