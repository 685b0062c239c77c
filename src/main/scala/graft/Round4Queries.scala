package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.operators.{GlobalOrder, RangeJoin, Similarity}
import graft.sources.Tables

/** Round-4 inventory extension (q107–q115): the last uncovered TPC-H query
  * *shapes* over the driver schema (Q8's conditional market share, Q9's
  * product-profit, Q10's returned-item report, Q12's priority split with
  * timestamp-interval filter, Q15's top-supplier-of-max-revenue, Q21's
  * sole-late-supplier multi-predicate), plus percent_rank/cume_dist
  * window coverage, a time-series gap-fill with hourly grid + forward
  * fill (the training-pipeline resample primitive), and levenshtein
  * edit-distance classification. All under the SURVEY §2.2 determinism
  * rules: total ORDER BY on a unique key, decimal-exact sums, ROUND(x,4)
  * on floating outputs, BIGINT-aligned integer outputs.
  */
object Round4Queries {

  import Queries.{dsumD, dsumSql, r4}

  def all: Seq[Q] = Seq(

    Q("q107_percent_rank",
      // percent_rank = (rank-1)/(n-1) and cume_dist = peers<=cur / n are
      // exact small-integer ratios -> one IEEE division each, identical in
      // both engines; the unique o_orderkey tie-break pins rank order.
      Some("""SELECT o_custkey, o_orderkey,
             |       ROUND(PERCENT_RANK() OVER
             |         (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 4) AS pr,
             |       ROUND(CUME_DIST() OVER
             |         (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey), 4) AS cd
             |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
          r4(percent_rank().over(w)).as("pr"),
          r4(cume_dist().over(w)).as("cd"))
          .orderBy("o_custkey", "o_orderkey")
      }),

    Q("q108_returned_items",
      // TPC-H Q10 shape: revenue lost to returns per customer in a quarter.
      // Scale: lineitem streams; orders filtered by the quarter BEFORE the
      // join; customer/nation broadcast-able dims.
      Some(s"""SELECT c_custkey, c_name, n_name,
              |       ROUND(${dsumSql("l_extendedprice * (1 - l_discount)")}, 4) AS revenue
              |FROM customer
              |JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON l_orderkey = o_orderkey
              |JOIN nation ON c_nationkey = n_nationkey
              |WHERE l_returnflag = 'R'
              |  AND o_orderdate >= TIMESTAMP '1996-01-01'
              |  AND o_orderdate < TIMESTAMP '1996-04-01'
              |GROUP BY c_custkey, c_name, n_name
              |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      (s, d) => Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.nation(s, d), col("n_nationkey") === col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(r4(dsumD(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey")).limit(20)),

    Q("q109_priority_split",
      // TPC-H Q12 shape (no l_shipmode in the driver schema -> split by
      // l_returnflag): orders whose lines shipped >30 days after the order
      // date, counted by priority class. The interval predicate is exact
      // microsecond arithmetic in both engines.
      Some("""SELECT l_returnflag,
             |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS high_cnt,
             |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
             |                THEN 0 ELSE 1 END) AS BIGINT) AS low_cnt
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        Tables.orders(s, d)
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
          .groupBy("l_returnflag")
          .agg(sum(when(hi, 1L).otherwise(0L)).as("high_cnt"),
            sum(when(hi, 0L).otherwise(1L)).as("low_cnt"))
          .orderBy("l_returnflag")
      }),

    Q("q110_waiting_suppliers",
      // TPC-H Q21 shape: suppliers who were the SOLE late supplier of a
      // multi-supplier finished order (late := shipped >60 days after the
      // order date). The classic EXISTS / NOT EXISTS pair is restated as
      // one per-order aggregate (distinct suppliers, distinct late
      // suppliers) joined back to the late lines — same relation, but at
      // 100 TB it is two scans instead of three correlated self-joins.
      Some("""WITH f AS (
             |  SELECT l_orderkey, l_suppkey,
             |         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
             |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
             |  WHERE o_orderstatus = 'F'),
             |stats AS (
             |  SELECT l_orderkey AS ok, COUNT(DISTINCT l_suppkey) AS n_supp,
             |         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
             |  FROM f GROUP BY 1)
             |SELECT s_name, COUNT(*) AS numwait
             |FROM f JOIN stats ON ok = l_orderkey
             |       JOIN supplier ON s_suppkey = l_suppkey
             |WHERE late AND n_supp > 1 AND n_late = 1
             |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin),
      (s, d) => {
        // One scan: reduce to (order, supplier) grain first (map-side
        // partial agg), derive the per-order supplier stats as a window
        // over that already-small grain, filter, and re-aggregate. The
        // two-scan EXISTS formulation reads the lineitem⋈orders join
        // twice; this reads it once — the shape that matters at 100 TB.
        val g = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(sum(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
            1L).otherwise(0L)).as("late_lines"))
        val w = Window.partitionBy(col("l_orderkey"))
        val withStats = g.select(col("l_suppkey"), col("late_lines"),
          count(lit(1)).over(w).as("n_supp"),
          sum(when(col("late_lines") > 0, 1L).otherwise(0L)).over(w).as("n_late"))
        withStats
          .filter(col("late_lines") > 0 && col("n_supp") > 1 && col("n_late") === 1)
          // supplier is scale-proportional: no broadcast hint, AQE decides
          .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
          .groupBy("s_name").agg(sum(col("late_lines")).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
      }),

    Q("q111_top_supplier",
      // TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
      // revenue. The max is over ROUND'ed decimal-exact revenues, so the
      // equality join is float-safe; the 1-row max relation broadcasts.
      Some(s"""WITH revenue AS (
              |  SELECT l_suppkey,
              |         ROUND(${dsumSql("l_extendedprice * (1 - l_discount)")}, 4) AS total_revenue
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |    AND l_shipdate < TIMESTAMP '1996-04-01'
              |  GROUP BY l_suppkey)
              |SELECT s_suppkey, s_name, total_revenue
              |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
              |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
              |ORDER BY s_suppkey""".stripMargin),
      (s, d) => {
        val revenue = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy("l_suppkey")
          .agg(r4(dsumD(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("total_revenue"))
        // One lineitem scan total: the per-supplier aggregate is
        // materialized once (localCheckpoint), then joined against a
        // broadcast 1-row MAX of itself. A global window here would funnel
        // every supplier row through a single task — fine at sf0.1, a
        // genuine bottleneck at 1B+ supplier keys — and a separate
        // .agg(max) subplan without the checkpoint would scan + aggregate
        // the fact twice (Catalyst does not dedup DataFrame subplans).
        val rev = revenue.localCheckpoint(true)
        rev.join(
            broadcast(rev.agg(max(col("total_revenue")).as("max_rev"))),
            col("total_revenue") === col("max_rev"))
          .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
          .select("s_suppkey", "s_name", "total_revenue")
          .orderBy("s_suppkey")
      }),

    Q("q112_market_share",
      // TPC-H Q8 shape: NATION_3 suppliers' share of revenue delivered to
      // ASIA customers, per order year. The conditional numerator is CASE
      // INSIDE the decimal cast on both sides, so numerator and denominator
      // are exact sums and the share is one IEEE division.
      Some("""SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
             |       ROUND(
             |         CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
             |                  THEN l_extendedprice * (1 - l_discount)
             |                  ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE)
             |         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
             |                  AS DECIMAL(18,4))) AS DOUBLE), 4) AS share
             |FROM lineitem
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN nation cn ON cn.n_nationkey = c_nationkey
             |JOIN region ON r_regionkey = cn.n_regionkey AND r_name = 'ASIA'
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN nation sn ON sn.n_nationkey = s_nationkey
             |GROUP BY 1 ORDER BY yr""".stripMargin),
      (s, d) => {
        val custNation = Tables.nation(s, d)
          .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
        val suppNation = Tables.nation(s, d)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("sn_name"))
        val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
        val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,4)")
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
          .join(broadcast(custNation), col("cn_key") === col("c_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
            col("r_regionkey") === col("cn_region"))
          // supplier is scale-proportional: no broadcast hint, AQE decides
          .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(suppNation), col("sn_key") === col("s_nationkey"))
          .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
          .agg(r4(
            sum(dec(when(col("sn_name") === "NATION_3", rev).otherwise(lit(0)))).cast("double") /
              sum(dec(rev)).cast("double")).as("share"))
          .orderBy("yr")
      }),

    Q("q113_product_profit",
      // TPC-H Q9 shape (no partsupp -> cost := 0.5 * retailprice * qty):
      // profit on 'red' parts per supplier nation and order year. The
      // per-row profit is pure double arithmetic (identical IEEE result in
      // both engines) summed exactly as decimal.
      Some(s"""SELECT n_name AS nat, CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
              |       ROUND(${dsumSql(
                       "l_extendedprice * (1 - l_discount) - 0.5 * p_retailprice * l_quantity")}, 4)
              |         AS profit
              |FROM lineitem
              |JOIN part ON p_partkey = l_partkey
              |JOIN supplier ON s_suppkey = l_suppkey
              |JOIN nation ON n_nationkey = s_nationkey
              |JOIN orders ON o_orderkey = l_orderkey
              |WHERE p_name LIKE '%red%'
              |GROUP BY 1, 2 ORDER BY nat, yr""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").like("%red%")),
          col("p_partkey") === col("l_partkey"))
        // supplier is scale-proportional: no broadcast hint, AQE decides
        .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("s_nationkey"))
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("n_name").as("nat"), year(col("o_orderdate")).cast("long").as("yr"))
        .agg(r4(dsumD(col("l_extendedprice") * (lit(1) - col("l_discount")) -
          lit(0.5) * col("p_retailprice") * col("l_quantity"))).as("profit"))
        .orderBy("nat", "yr")),

    Q("q114_gap_fill",
      // Time-series resample: per user, an hourly grid from the user's
      // first to last event hour, forward-filling the hour's closing value
      // (arg-max by event_id) across empty hours — the training-pipeline
      // gap-fill primitive. Grid = sequence/explode (generate_series in
      // DuckDB); fill = last(v, ignoreNulls) over an unbounded-preceding
      // row frame. Bounded by users x hours, never by events^2.
      Some("""WITH hourly AS (
             |  SELECT user_id, DATE_TRUNC('hour', ts) AS hour,
             |         ROUND(ARG_MAX(value, event_id), 4) AS v
             |  FROM events WHERE user_id < 100 GROUP BY 1, 2),
             |grid AS (
             |  SELECT user_id, UNNEST(GENERATE_SERIES(MIN(hour), MAX(hour),
             |                                         INTERVAL 1 HOUR)) AS hour
             |  FROM hourly GROUP BY user_id)
             |SELECT g.user_id,
             |       strftime(g.hour, '%Y-%m-%d %H:%M:%S') AS hour,
             |       LAST_VALUE(h.v IGNORE NULLS) OVER
             |         (PARTITION BY g.user_id ORDER BY g.hour
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_fill,
             |       CAST(CASE WHEN h.v IS NULL THEN 0 ELSE 1 END AS INT) AS had_event
             |FROM grid g LEFT JOIN hourly h
             |  ON h.user_id = g.user_id AND h.hour = g.hour
             |ORDER BY g.user_id, hour""".stripMargin),
      (s, d) => {
        val hourly = Tables.events(s, d).filter(col("user_id") < 100)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
          .agg(r4(max_by(col("value"), col("event_id"))).as("v"))
        val grid = hourly.groupBy("user_id")
          .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
          .select(col("user_id"),
            explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.join(hourly, Seq("user_id", "hour"), "left")
          .select(col("user_id"),
            date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
            last(col("v"), ignoreNulls = true).over(w).as("v_fill"),
            when(col("v").isNull, 0).otherwise(1).cast("int").as("had_event"))
          .orderBy("user_id", "hour")
      }),

    Q("q115_levenshtein",
      // Edit-distance classification: each part name scored against three
      // prototype names, class = argmin with a fixed CASE tie-break (the
      // same CASE chain in both engines, so ties resolve identically).
      Some("""SELECT p_partkey,
             |       CAST(levenshtein(p_name, 'red widget') AS BIGINT) AS dist,
             |       CASE WHEN levenshtein(p_name, 'red widget') <= levenshtein(p_name, 'blue bolt')
             |             AND levenshtein(p_name, 'red widget') <= levenshtein(p_name, 'small gear')
             |            THEN 'widget'
             |            WHEN levenshtein(p_name, 'blue bolt') <= levenshtein(p_name, 'small gear')
             |            THEN 'bolt' ELSE 'gear' END AS cls
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, d) => {
        val d1 = levenshtein(col("p_name"), lit("red widget"))
        val d2 = levenshtein(col("p_name"), lit("blue bolt"))
        val d3 = levenshtein(col("p_name"), lit("small gear"))
        Tables.part(s, d).select(col("p_partkey"),
          d1.cast("long").as("dist"),
          when(d1 <= d2 && d1 <= d3, "widget")
            .when(d2 <= d3, "bolt").otherwise("gear").as("cls"))
          .orderBy("p_partkey")
      }),

    Q("q116_time_range_frame",
      // Value-based TIME range frame (vs q62's numeric range): per event,
      // count + sum of the user's events in the trailing hour. The order
      // key is exact integer epoch-micros (unix_micros / epoch_us) so the
      // frame bound 3_600_000_000 is engine-portable; the frame sum is a
      // decimal accumulation — exact under any add/remove order, unlike a
      // sliding double sum.
      Some("""SELECT user_id, event_id, cnt_1h,
             |       ROUND(CAST(sum_1h AS DOUBLE), 4) AS sum_1h
             |FROM (
             |  SELECT user_id, event_id,
             |         COUNT(*) OVER w AS cnt_1h,
             |         SUM(CAST(value AS DECIMAL(18,4))) OVER w AS sum_1h
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)) t
             |ORDER BY user_id, event_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
          .rangeBetween(-3600000000L, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(w).as("cnt_1h"),
            r4(sum(col("value").cast("decimal(18,4)")).over(w).cast("double"))
              .as("sum_1h"))
          .orderBy("user_id", "event_id")
      }),

    Q("q117_array_setops",
      // Array set algebra over tokenized text: both engines' intersect/
      // except dedup, so sorting the results makes them order-canonical;
      // emitted as joined strings to keep the comparison value-stable.
      // COALESCE: DuckDB's array_to_string is a string_agg (NULL on an
      // empty list), Spark's array_join is '' — align on ''.
      Some("""SELECT doc_id,
             |       COALESCE(array_to_string(list_sort(list_distinct(
             |         list_intersect(string_split(text, ' '),
             |                        ['the','a','of','and','is']))), ','), '') AS stop_hits,
             |       CAST(LEN(list_distinct(list_filter(string_split(text, ' '),
             |         x -> NOT list_contains(['the','a','of','and','is'], x)))) AS BIGINT)
             |         AS content_vocab
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val stop = array(Seq("the", "a", "of", "and", "is").map(lit): _*)
        val toks = split(col("text"), " ")
        Tables.documents(s, d).select(col("doc_id"),
          coalesce(array_join(array_sort(array_intersect(toks, stop)), ","), lit(""))
            .as("stop_hits"),
          size(array_distinct(array_except(toks, stop))).cast("long")
            .as("content_vocab"))
          .orderBy("doc_id")
      }),

    Q("q118_stratified_sample",
      // Stratified deterministic downsampling: per language, keep the
      // first ceil(20%) of documents in md5(doc_id) order — the
      // reproducible, engine-stable alternative to sampleBy()'s RNG, and
      // the standard way to cap a dominant language in a training mix.
      // ceil(0.2*n): restated multiplicatively (rn*5 <= n*1 would be 20%
      // floor; use (rn-1)*5 < n for ceil) to avoid float quotients.
      Some("""SELECT lang, doc_id
             |FROM (SELECT lang, doc_id,
             |             ROW_NUMBER() OVER (PARTITION BY lang
             |               ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
             |             COUNT(*) OVER (PARTITION BY lang) AS n
             |      FROM documents) t
             |WHERE (rn - 1) * 5 < n
             |ORDER BY lang, doc_id""".stripMargin),
      (s, d) => {
        // per-LANG rank: five langs would be five whole-table window
        // tasks — GroupPrefix ranks over the range-partitioned
        // composite (lang, md5, doc_id) order instead, with the lang
        // totals riding along broadcast.
        val base = Tables.documents(s, d)
          .select(col("lang"), col("doc_id"),
            md5(col("doc_id").cast("string")).as("_k"))
        graft.operators.GroupPrefix.rowNumber(base, "lang",
            Seq(col("_k"), col("doc_id")), "rn", keepTotals = true)
          .filter((col("rn") - 1) * 5 < col("_gp_tot"))
          .select("lang", "doc_id")
          .orderBy("lang", "doc_id")
      }),

    Q("q119_regression",
      // Least-squares slope/intercept/R^2 from decimal-exact co-moment
      // sums (the q75 pattern): built-in regr_slope/regr_r2 accumulate
      // doubles in shuffle order and cannot be hash-checked; this
      // formulation is one exact aggregate plus identical IEEE double
      // algebra in both engines.
      Some("""WITH s AS (
             |  SELECT l_returnflag, COUNT(*) AS n,
             |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
             |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
             |         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS sxy,
             |         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sxx,
             |         CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(25,4))) AS DOUBLE) AS syy
             |  FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag, n,
             |       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS slope,
             |       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4) AS intercept,
             |       ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             |             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r2
             |FROM s ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        val dec = (e: org.apache.spark.sql.Column, t: String) => sum(e.cast(t)).cast("double")
        val st = Tables.lineitem(s, d).groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          dec(col("l_quantity"), "decimal(18,4)").as("sx"),
          dec(col("l_extendedprice"), "decimal(18,4)").as("sy"),
          dec(col("l_quantity") * col("l_extendedprice"), "decimal(25,4)").as("sxy"),
          dec(col("l_quantity") * col("l_quantity"), "decimal(20,4)").as("sxx"),
          dec(col("l_extendedprice") * col("l_extendedprice"), "decimal(25,4)").as("syy"))
        val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))
        val r2num = (col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy"))
        val r2den = (col("n") * col("sxx") - col("sx") * col("sx")) *
          (col("n") * col("syy") - col("sy") * col("sy"))
        st.select(col("l_returnflag"), col("n"),
          r4(slope).as("slope"),
          r4((col("sy") - slope * col("sx")) / col("n")).as("intercept"),
          r4(r2num / r2den).as("r2"))
          .orderBy("l_returnflag")
      }),

    Q("q120_tpch_q6",
      // TPC-H Q6: the forecast-revenue-change scan — filter-only agg, no
      // join. Both engines compare the same parquet double bits against
      // the same literals, so the BETWEEN on discount is engine-stable.
      Some(s"""SELECT ROUND(${dsumSql("l_extendedprice * l_discount")}, 4) AS revenue_delta,
              |       CAST(COUNT(*) AS BIGINT) AS cnt
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |  AND l_shipdate < TIMESTAMP '1997-01-01'
              |  AND l_discount BETWEEN 0.05 AND 0.07
              |  AND l_quantity < 24""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(r4(dsumD(col("l_extendedprice") * col("l_discount"))).as("revenue_delta"),
          count(lit(1)).as("cnt"))),

    Q("q121_union_by_name",
      // Schema-aligned union (unionByName with allowMissingColumns ==
      // DuckDB's UNION ALL BY NAME): columns match by NAME across sides
      // with different order and an extra column null-padded on one side.
      Some("""SELECT key, bal, src, CAST(extra AS BIGINT) AS extra
             |FROM (SELECT c_custkey AS key, ROUND(c_acctbal, 4) AS bal,
             |             'customer' AS src FROM customer
             |      UNION ALL BY NAME
             |      SELECT s_nationkey AS extra, s_suppkey AS key,
             |             ROUND(s_acctbal, 4) AS bal, 'supplier' AS src
             |      FROM supplier) t
             |ORDER BY src, key""".stripMargin),
      (s, d) => {
        val cust = Tables.customer(s, d).select(
          col("c_custkey").as("key"), r4(col("c_acctbal")).as("bal"),
          lit("customer").as("src"))
        val supp = Tables.supplier(s, d).select(
          col("s_nationkey").cast("long").as("extra"), col("s_suppkey").as("key"),
          r4(col("s_acctbal")).as("bal"), lit("supplier").as("src"))
        cust.unionByName(supp, allowMissingColumns = true)
          .select("key", "bal", "src", "extra")
          .orderBy("src", "key")
      }),

    Q("q122_doc_chunks",
      // Document chunking for training: overlapping token windows (size 20,
      // stride 10) via sequence/explode + array slice — the standard
      // long-document -> context-window preprocessing step. Slice mapping:
      // Spark slice(arr, start, len) == DuckDB arr[start : start+len-1]
      // (inclusive end). Chunk count = floor((n_tok-1)/stride)+1.
      Some("""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
             |c AS (
             |  SELECT doc_id, i,
             |         toks[1 + 10 * i : LEAST(10 * i + 20, LEN(toks))] AS ch
             |  FROM t, UNNEST(GENERATE_SERIES(0,
             |         CAST(FLOOR((LEN(toks) - 1) / 10.0) AS BIGINT))) AS u(i))
             |SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
             |       CAST(LEN(ch) AS BIGINT) AS n_toks,
             |       array_to_string(ch, ' ') AS chunk
             |FROM c ORDER BY doc_id, chunk_id""".stripMargin),
      (s, d) => {
        val toks = split(col("text"), " ")
        Tables.documents(s, d)
          .select(col("doc_id"), toks.as("toks"))
          .select(col("doc_id"), col("toks"),
            explode(sequence(lit(0L),
              floor((size(col("toks")) - 1) / lit(10.0)).cast("long"))).as("i"))
          .select(col("doc_id"), col("i").as("chunk_id"),
            slice(col("toks"), (lit(1) + lit(10) * col("i")).cast("int"), lit(20)).as("ch"))
          .select(col("doc_id"), col("chunk_id"),
            size(col("ch")).cast("long").as("n_toks"),
            array_join(col("ch"), " ").as("chunk"))
          .orderBy("doc_id", "chunk_id")
      }),

    Q("q123_sequence_packing",
      // Greedy sequential packing of documents into fixed-capacity token
      // bins (the LLM sequence-packing shape): bin id = floor(cumulative
      // tokens BEFORE this doc / capacity) in deterministic doc_id order —
      // pure integer/window math, engine-stable. Summarized per bin.
      Some("""WITH t AS (
             |  SELECT doc_id, CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, n_tok,
             |         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
             |  FROM t)
             |SELECT CAST(FLOOR(cum_before / 500.0) AS BIGINT) AS bin,
             |       CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
             |FROM c GROUP BY 1 ORDER BY bin""".stripMargin),
      (s, d) => {
        // A bare Window.orderBy here would serialize the whole corpus onto
        // one task; GlobalOrder does the same math as a range-partitioned
        // two-pass prefix scan (see operators/GlobalOrder.scala).
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
        GlobalOrder.exclusiveRunningSum(toks, Seq(col("doc_id")), "n_tok", "cum_before")
          .groupBy(floor(col("cum_before") / lit(500.0)).cast("long").as("bin"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("total_tokens"))
          .orderBy("bin")
      }),

    Q("q124_tpch_q3",
      // TPC-H Q3 shape (shipping priority; o_orderpriority stands in for
      // the schema's missing o_shippriority): unshipped-revenue top-10 for
      // one market segment. Scale: both cutoff filters reach the scans,
      // customer is the smallest relation after its segment filter.
      Some(s"""SELECT o_orderkey,
              |       ROUND(${dsumSql("l_extendedprice * (1 - l_discount)")}, 4) AS revenue,
              |       strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
              |FROM customer JOIN orders ON c_custkey = o_custkey
              |JOIN lineitem ON l_orderkey = o_orderkey
              |WHERE c_mktsegment = 'BUILDING'
              |  AND o_orderdate < TIMESTAMP '1996-07-01'
              |  AND l_shipdate > TIMESTAMP '1996-07-01'
              |GROUP BY o_orderkey, o_orderdate, o_orderpriority
              |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1996-07-01").cast("timestamp"))
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate") < lit("1996-07-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey"), col("c_custkey") === col("o_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(r4(dsumD(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
        .select(col("o_orderkey"), col("revenue"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)),

    Q("q125_global_rownum",
      // GlobalOrder.rowNumber itself under the oracle: a full-table global
      // sequence number in (o_totalprice DESC, o_orderkey) order — what a
      // single-partition ROW_NUMBER() window computes, produced by the
      // range-partitioned two-pass scan instead.
      Some("""SELECT o_orderkey,
             |       ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, d) => GlobalOrder.rowNumber(
          Tables.orders(s, d).select("o_orderkey", "o_totalprice"),
          Seq(col("o_totalprice").desc, col("o_orderkey")), "rn")
        .select("o_orderkey", "rn")
        .orderBy("o_orderkey")),

    Q("q126_length_vigintiles",
      // GlobalOrder.ntile under the oracle: documents cut into 20 exact
      // global length tiles (k does not divide n, so tile sizes differ by
      // one — the piecewise NTILE arithmetic is what's being checked),
      // then summarized per tile.
      Some("""WITH t AS (
             |  SELECT n_chars, NTILE(20) OVER (ORDER BY n_chars, doc_id) AS tile
             |  FROM documents)
             |SELECT CAST(tile AS BIGINT) AS tile, COUNT(*) AS n_docs,
             |       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
             |       CAST(MAX(n_chars) AS BIGINT) AS max_chars
             |FROM t GROUP BY tile ORDER BY tile""".stripMargin),
      (s, d) => GlobalOrder.ntile(
          Tables.documents(s, d).select("doc_id", "n_chars"),
          20, Seq(col("n_chars"), col("doc_id")), "tile")
        .groupBy("tile")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).cast("long").as("min_chars"),
          max(col("n_chars")).cast("long").as("max_chars"))
        .orderBy("tile")),

    Q("q128_hof_arith",
      // The scalar higher-order-function family in one pass (transform /
      // filter / zip_with / aggregate == DuckDB list_transform /
      // list_filter / list_zip / list_aggregate): token-length stats per
      // document, all integer-exact so fold order cannot drift.
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_transform(string_split(text, ' '), s -> LEN(s)) AS lens
             |  FROM documents)
             |SELECT doc_id, CAST(LEN(lens) AS BIGINT) AS n_tok,
             |       CAST(list_aggregate(lens, 'sum') AS BIGINT) AS sum_len,
             |       CAST(LEN(list_filter(lens, l -> l % 2 = 0)) AS BIGINT) AS even_cnt,
             |       CAST(list_aggregate(list_transform(
             |              list_zip(lens, GENERATE_SERIES(1, LEN(lens))),
             |              p -> p[1] * p[2]), 'sum') AS BIGINT) AS pos_wsum
             |FROM t ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val lens = transform(split(col("text"), " "), t => length(t).cast("long"))
        Tables.documents(s, d)
          .select(col("doc_id"), lens.as("lens"))
          .select(col("doc_id"),
            size(col("lens")).cast("long").as("n_tok"),
            aggregate(col("lens"), lit(0L), (acc, x) => acc + x).as("sum_len"),
            size(filter(col("lens"), l => l % 2 === 0)).cast("long").as("even_cnt"),
            aggregate(zip_with(col("lens"), sequence(lit(1L), size(col("lens")).cast("long")),
              (l, i) => l * i), lit(0L), (acc, x) => acc + x).as("pos_wsum"))
          .orderBy("doc_id")
      }),

    Q("q130_keyless_range_join",
      // Keyless point-in-interval via operators/RangeJoin: lineitem prices
      // against per-part price bands with NO equi-key — naive Catalyst
      // planning is a nested loop; the banded rewrite makes it a hash join
      // on the bucket id and must return exactly the BETWEEN semantics.
      Some("""WITH bands AS (
             |  SELECT p_brand, p_retailprice * 0.97 AS lo, p_retailprice * 1.03 AS hi
             |  FROM part)
             |SELECT p_brand, COUNT(*) AS cnt
             |FROM lineitem JOIN bands ON l_extendedprice BETWEEN lo AND hi
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      (s, d) => {
        val bands = Tables.part(s, d).select(col("p_brand"),
          (col("p_retailprice") * 0.97).as("lo"), (col("p_retailprice") * 1.03).as("hi"))
        // width from the data, not a constant: the regenerated testdata
        // packed the bands ~10x denser and a fixed w=100 paid 2.4x the
        // irreducible candidate count (see RangeJoin.pointInIntervalAuto).
        // The residual sf1 cost is OUTPUT-bound, not plan-bound: the true
        // match count is 6.06e8 rows at sf1 (measured) — ~23 ns/match on
        // 32 cores — because ±3% bands over densely packed part prices
        // overlap heavily; no banding can beat the join's own cardinality.
        RangeJoin.pointInIntervalAuto(
            Tables.lineitem(s, d).select("l_extendedprice"), "l_extendedprice",
            bands, "lo", "hi")
          .groupBy("p_brand").agg(count(lit(1)).as("cnt"))
          .orderBy("p_brand")
      }),

    Q("q129_hashes",
      // Cryptographic digests are engine-independent by definition: md5 and
      // sha-256 of the same bytes must agree as lowercase hex in any
      // implementation (unlike hash()/xxhash64, whose seeds are private).
      Some("""SELECT c_custkey, md5(c_name) AS h_md5, sha256(c_name) AS h_sha256
             |FROM customer ORDER BY c_custkey""".stripMargin),
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"), md5(col("c_name")).as("h_md5"),
          sha2(col("c_name"), 256).as("h_sha256"))
        .orderBy("c_custkey"))
  ) ++ Seq(lshQuery, lshMultiProbeQuery, lshBandedNearDupQuery)

  // ---- q127: LSH ANN under the oracle ------------------------------------

  /** DuckDB twin of one hyperplane sign bit: the same double plane
    * components as SQL literals, taken through an explicit DOUBLE[] ->
    * FLOAT[] cast chain — without the DOUBLE[] step DuckDB parses the
    * decimal literals as DECIMAL and its DECIMAL->FLOAT cast is off by
    * 1 ULP for ~30% of components (measured), which would fork the sign
    * of any dot product within ~1e-7 of 0. The fold itself is the shared
    * [[TrainingQueries.dotSql]] fragment, mirroring FloatVecDot. */
  private[graft] def bucketSql(v: String, dim: Int, nBits: Int): String =
    Similarity.hyperplanes(dim, nBits).zipWithIndex.map { case (p, b) =>
      val plane = s"([${p.mkString(", ")}]::DOUBLE[]::FLOAT[])"
      s"(CASE WHEN ${TrainingQueries.dotSql(v, plane)} > 0.0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def lshQuery: Q = Q("q127_ann_lsh",
    // Random-hyperplane LSH ANN (the scale path beside q44's IVF): probe
    // ONLY the query's sign-bit bucket, exact cosine top-k inside it. The
    // planes are deterministic splitmix values, so the oracle rebuilds the
    // identical buckets and must agree on the exact candidate set.
    Some(s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
            |qv AS (SELECT embedding AS qe FROM v WHERE vec_id = 0),
            |b AS (SELECT vec_id, embedding,
            |             ${bucketSql("embedding", 64, 8)} AS bkt
            |      FROM v WHERE vec_id <> 0),
            |qb AS (SELECT ${bucketSql("qe", 64, 8)} AS bkt FROM qv)
            |SELECT vec_id, ROUND(${TrainingQueries.cosOf("b.embedding", "q.qe")}, 4) AS sim
            |FROM b JOIN qb USING (bkt) CROSS JOIN qv q
            |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.lshTopK(
        emb.filter(col("vec_id") =!= 0),
        emb.filter(col("vec_id") === 0).select(col("embedding").as("qe")),
        k = 10, dim = 64)
    })

  private def lshMultiProbeQuery: Q = Q("q141_ann_lsh_multiprobe",
    // The multi-probe recall knob MEASURED (the q140 study, for LSH):
    // recall@10 and candidate counts of the exact-bucket probe vs the
    // Hamming<=1 probe set (query bucket + each sign bit flipped, the
    // Lv et al. multi-probe scheme) against the brute-force top-10.
    // Buckets, probes, and cosines are all deterministic splitmix/float
    // arithmetic, so the oracle rebuilds the exact candidate sets — the
    // approximation error of the recall knob is itself hash-checked.
    Some {
      def lshTop(cand: String): String =
        s"""(SELECT vec_id FROM (
           |  SELECT c.vec_id, ROW_NUMBER() OVER (
           |    ORDER BY ${TrainingQueries.cosOf("c.embedding", "q.qe")} DESC, c.vec_id) AS rn
           |  FROM $cand c CROSS JOIN qv q) t WHERE rn <= 10)""".stripMargin
      val flips = (0 until 8).map(b => s"SELECT xor(bkt, ${1L << b}) FROM qb")
        .mkString(" UNION ALL ")
      s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
         |qv AS (SELECT embedding AS qe FROM v WHERE vec_id = 0),
         |b AS (SELECT vec_id, embedding,
         |             ${bucketSql("embedding", 64, 8)} AS bkt
         |      FROM v WHERE vec_id <> 0),
         |qb AS (SELECT ${bucketSql("qe", 64, 8)} AS bkt FROM qv),
         |probes AS (SELECT bkt FROM qb UNION ALL $flips),
         |cand1 AS (SELECT vec_id, embedding FROM b JOIN qb USING (bkt)),
         |candm AS (SELECT b.vec_id, b.embedding FROM b JOIN probes USING (bkt)),
         |brute AS (SELECT vec_id FROM (
         |  SELECT v2.vec_id, ROW_NUMBER() OVER (
         |    ORDER BY ${TrainingQueries.cosOf("v2.embedding", "q.qe")} DESC, v2.vec_id) AS rn
         |  FROM v v2 CROSS JOIN qv q WHERE v2.vec_id <> 0) t WHERE rn <= 10),
         |top1 AS ${lshTop("cand1")},
         |topm AS ${lshTop("candm")}
         |SELECT
         |  (SELECT COUNT(*) FROM cand1) AS cand_1probe,
         |  (SELECT COUNT(*) FROM candm) AS cand_multiprobe,
         |  ROUND((SELECT COUNT(*) FROM top1 JOIN brute USING (vec_id)) / 10.0, 4) AS recall_1probe,
         |  ROUND((SELECT COUNT(*) FROM topm JOIN brute USING (vec_id)) / 10.0, 4) AS recall_multiprobe""".stripMargin
    },
    (s, d) => {
      import graft.functions.VectorFunctions.cosine
      val emb = Tables.embeddings(s, d)
      val base = emb.filter(col("vec_id") =!= 0)
      val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
      val bucketed = base.withColumn("bkt",
        Similarity.hyperplaneBucket(col("embedding"), 64, 8))
      val qb = query.select(Similarity.hyperplaneBucket(col("qe"), 64, 8).as("bkt"))
      val probes = qb.select(explode(array(
        col("bkt") +: (0 until 8).map(b => col("bkt").bitwiseXOR(lit(1L << b))): _*
      )).as("bkt"))
      val cand1 = bucketed.join(broadcast(qb), "bkt")
      val candM = bucketed.join(broadcast(probes), "bkt")
      def top10(df: org.apache.spark.sql.DataFrame) = df
        .crossJoin(broadcast(query))
        .select(col("vec_id"), cosine(col("embedding"), col("qe")).as("c"))
        .orderBy(col("c").desc, col("vec_id")).limit(10).select("vec_id")
      val brute = top10(base)
      val n1 = cand1.agg(count(lit(1)).as("cand_1probe"))
      val nm = candM.agg(count(lit(1)).as("cand_multiprobe"))
      val h1 = top10(cand1).join(brute, "vec_id").agg(count(lit(1)).as("h1"))
      val hm = top10(candM).join(brute, "vec_id").agg(count(lit(1)).as("hm"))
      n1.crossJoin(nm).crossJoin(h1).crossJoin(hm)
        .select(col("cand_1probe"), col("cand_multiprobe"),
          r4(col("h1") / 10.0).as("recall_1probe"),
          r4(col("hm") / 10.0).as("recall_multiprobe"))
    })

  private def lshBandedNearDupQuery: Q = Q("q143_neardup_lsh_banded",
    // q43's embedding near-dup by the BLOCK-FIRST formulation its scaladoc
    // prescribes past the broadcast limit: hyperplane sign bits split into
    // four bands, candidates = pairs agreeing on at least one band,
    // exact-verified with the same rounded cosine. Output is a subset of
    // q43's exact pairs (banding recall, SimilaritySpec measures it);
    // the deterministic planes make the candidate set oracle-identical.
    // Band WIDTH is the quadratic-control knob (candidates ~ bands·n²/2^w)
    // and is CORPUS-DERIVED (Similarity.adaptiveBandBits: smallest w with
    // 2^w·8 ≥ n, floor 8, cap 15 — round-12 bandstats measured the frozen
    // w=8 at 0.03 % precision), rendered below as the same integer
    // ladder. The oracle computes the bucket at the FULL 60-bit ceiling
    // (each bit is an independent plane, so low bits match any width)
    // and masks per the derived width; at every oracle-checked scale the
    // ladder floors at w=8 — bit-identical to the historic 32-bit form.
    Some(s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
            |bb AS (SELECT COALESCE(MIN(w), 15) AS w
            |       FROM (VALUES (8),(9),(10),(11),(12),(13),(14),(15)) l(w)
            |       WHERE (CAST(1 AS BIGINT) << w) * 8 >= (SELECT COUNT(*) FROM v)),
            |b AS (SELECT vec_id, ${bucketSql("embedding", 64, 60)} AS bkt FROM v),
            |bands AS (SELECT vec_id, bi,
            |                 (bkt >> (bi * bb.w)) & ((CAST(1 AS BIGINT) << bb.w) - 1) AS bv
            |          FROM b CROSS JOIN bb
            |          CROSS JOIN (VALUES (0),(1),(2),(3)) t(bi)),
            |cand AS (SELECT DISTINCT a.vec_id AS a_id, b2.vec_id AS b_id
            |         FROM bands a JOIN bands b2
            |           ON a.bi = b2.bi AND a.bv = b2.bv AND a.vec_id < b2.vec_id),
            |p AS (SELECT c.a_id, c.b_id,
            |             ROUND(${TrainingQueries.cosOf("va.embedding", "vb.embedding")}, 4) AS sim
            |      FROM cand c JOIN v va ON va.vec_id = c.a_id
            |                  JOIN v vb ON vb.vec_id = c.b_id)
            |SELECT a_id, b_id, sim FROM p WHERE sim >= 0.45
            |ORDER BY a_id, b_id""".stripMargin),
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val w = Similarity.adaptiveBandBits(emb.count())
      Similarity.lshBandedNearDupPairs(emb, threshold = 0.45, dim = 64,
          nBits = 4 * w, bands = 4)
        .orderBy("a_id", "b_id")
    })
}
