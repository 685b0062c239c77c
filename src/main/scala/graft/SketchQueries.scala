package graft

import org.apache.spark.sql.functions._
import graft.Queries.{Q, r4}
import graft.operators.{Layout, Sketch}
import graft.sources.Tables

/** Round-4 sketch/layout inventory (q131–q133): engine-portable
  * approximate structures that the usual built-ins keep OUT of a
  * hash-checked suite. Spark's `approx_count_distinct` and
  * `bloom_filter_agg` are engine-private (tolerance-testable only);
  * these md5-based formulations produce bit-identical results in DuckDB,
  * so the sketches themselves sit in the t2 inventory:
  *  - q131: HyperLogLog distinct-count registers + estimate (the 100 TB
  *    distinct-rollup primitive — shuffle carries registers, not rows);
  *  - q132: bloom-filter semi-join pre-filter with its false positives
  *    QUANTIFIED against the exact semi join;
  *  - q133: Z-order interleave layout stats (multi-dimensional data
  *    skipping — what OPTIMIZE ZORDER clusters, validated as arithmetic).
  */
object SketchQueries {

  def all: Seq[Q] = Seq(

    Q("q131_hll_distinct",
      // HLL m=64 per returnflag vs exact COUNT(DISTINCT): Z is exact in
      // double (all terms multiples of 2^-27, sum < 64), the estimate one
      // IEEE division — the only libm step (ln) hides behind the
      // small-range branch, untaken at every tested scale (raw E >> 160).
      Some(s"""WITH est AS (
              |  ${Sketch.hllEstimateSql("lineitem", "l_partkey", "l_returnflag")}),
              |ex AS (
              |  SELECT l_returnflag AS grp, COUNT(DISTINCT l_partkey) AS exact_distinct
              |  FROM lineitem GROUP BY 1)
              |SELECT grp AS l_returnflag, ROUND(hll_est, 4) AS hll_est, exact_distinct,
              |       ROUND(ABS(hll_est - exact_distinct) / exact_distinct, 4) AS rel_err
              |FROM est JOIN ex USING (grp) ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val est = Sketch.hllEstimate(li, "l_partkey", Seq("l_returnflag"))
        val exact = li.groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("exact_distinct"))
        est.join(exact, "l_returnflag")
          .select(col("l_returnflag"), r4(col("hll_est")).as("hll_est"),
            col("exact_distinct"),
            r4(abs(col("hll_est") - col("exact_distinct")) / col("exact_distinct"))
              .as("rel_err"))
          .orderBy("l_returnflag")
      }),

    Q("q132_bloom_semi",
      // Bloom pre-filter (m=2048, k=3) for "lineitems of negative-balance
      // suppliers": the probe is a literal-bitmask bit test — zero
      // shuffle, zero join on the fact side — and the exact semi join
      // quantifies its false positives. The oracle rebuilds the filter as
      // a distinct-position set; "all k positions set" is by construction
      // the same predicate as the bitmask test.
      Some {
        val posBad = (1 to 3).map(i => Sketch.bloomPosSql(i, "s_suppkey", 2048))
        val posLi = (1 to 3).map(i => Sketch.bloomPosSql(i, "l_suppkey", 2048))
        s"""WITH bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
           |pos AS (SELECT DISTINCT p FROM (
           |  SELECT ${posBad(0)} AS p FROM bad
           |  UNION ALL SELECT ${posBad(1)} FROM bad
           |  UNION ALL SELECT ${posBad(2)} FROM bad)),
           |cand AS (
           |  SELECT l_returnflag, COUNT(*) AS bloom_candidates
           |  FROM lineitem
           |  WHERE ${posLi(0)} IN (SELECT p FROM pos)
           |    AND ${posLi(1)} IN (SELECT p FROM pos)
           |    AND ${posLi(2)} IN (SELECT p FROM pos)
           |  GROUP BY 1),
           |tru AS (
           |  SELECT l_returnflag, COUNT(*) AS true_matches
           |  FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM bad)
           |  GROUP BY 1)
           |SELECT l_returnflag, bloom_candidates,
           |       COALESCE(true_matches, 0) AS true_matches,
           |       bloom_candidates - COALESCE(true_matches, 0) AS false_positives
           |FROM cand LEFT JOIN tru USING (l_returnflag)
           |ORDER BY l_returnflag""".stripMargin
      },
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val bad = Tables.supplier(s, d)
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        val mask = Sketch.bloomBuild(bad, "s_suppkey", 2048, 3)
        // project the h32 once; the 3 bit tests share it (md5 once per
        // row — Filter codegen does not CSE a repeated md5)
        val cand = li
          .select(col("l_returnflag"),
            graft.functions.HashFunctions.h32(col("l_suppkey").cast("string")).as("h"))
          .filter(Sketch.bloomProbeOnHash(col("h"), mask, 2048, 3))
          .groupBy("l_returnflag").agg(count(lit(1)).as("bloom_candidates"))
        val tru = li.join(bad, col("l_suppkey") === col("s_suppkey"), "left_semi")
          .groupBy("l_returnflag").agg(count(lit(1)).as("true_matches"))
        // true matches ⊆ bloom candidates (no false negatives), so cand
        // drives the outer join
        cand.join(tru, Seq("l_returnflag"), "left_outer")
          .select(col("l_returnflag"), col("bloom_candidates"),
            coalesce(col("true_matches"), lit(0L)).as("true_matches"),
            (col("bloom_candidates") - coalesce(col("true_matches"), lit(0L)))
              .as("false_positives"))
          .orderBy("l_returnflag")
      }),

    Q("q133_zorder_stats",
      // Z-interleave (10 bits x 2 dims) of bucketed (partkey, suppkey),
      // summarized per 4096-wide z-block: each block's min/max is tight in
      // BOTH dimensions — the property parquet footer pruning exploits.
      // Pure integer floor-div arithmetic, identical form both engines.
      Some(s"""WITH t AS (
              |  SELECT l_partkey % 1024 AS xb, l_suppkey % 1024 AS yb FROM lineitem),
              |z AS (
              |  SELECT xb, yb, ${Layout.zValueSql(Seq("xb", "yb"), 10)} AS z FROM t)
              |SELECT CAST(FLOOR(z / 4096.0) AS BIGINT) AS z_block,
              |       COUNT(*) AS cnt,
              |       MIN(xb) AS min_x, MAX(xb) AS max_x,
              |       MIN(yb) AS min_y, MAX(yb) AS max_y
              |FROM z GROUP BY 1 ORDER BY z_block""".stripMargin),
      (s, d) => {
        val zb = Tables.lineitem(s, d)
          .select(pmod(col("l_partkey"), lit(1024L)).cast("long").as("xb"),
            pmod(col("l_suppkey"), lit(1024L)).cast("long").as("yb"))
          .select(col("xb"), col("yb"),
            Layout.zValue(Seq(col("xb"), col("yb")), 10).as("z"))
        zb.groupBy(floor(col("z") / 4096L).cast("long").as("z_block"))
          .agg(count(lit(1)).as("cnt"),
            min(col("xb")).as("min_x"), max(col("xb")).as("max_x"),
            min(col("yb")).as("min_y"), max(col("yb")).as("max_y"))
          .orderBy("z_block")
      })
  )
}
