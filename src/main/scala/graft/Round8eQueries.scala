package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Queries.Q
import graft.operators.{Expectations, GroupMedian, Skew}
import graft.sources.Tables

/** Round-8 fifth batch: operational data-quality and similarity tooling —
  * inter-arrival gap quantiles (GroupMedian's general p-quantile),
  * a deletion-neighborhood edit-distance join (the FastSS blocking that
  * makes fuzzy entity dedup an equi-join), a Deequ-style expectations
  * report, prefix autocomplete top-k, week-over-week rate shifts, and
  * total-variation drift between temporal halves (the log-free PSI).
  * Exact-integer discipline as ever: nearest-rank quantiles, integer
  * ratios in ppm, TVD as a cross-multiplied integer sum. */
object Round8eQueries {

  def all: Seq[Q] = Seq(

    Q("q263_gap_quantiles",
      // Inter-arrival gap profile per event type: exact nearest-rank
      // median and p90 of the per-user gap between consecutive events.
      // The lag window partitions by USER (high-cardinality — users are
      // the parallelism); the per-TYPE quantiles then go through
      // GroupMedian's range-partitioned prefix scan, NOT a 5-way
      // type-partitioned window. Gaps in whole seconds, all integers.
      Some("""WITH o AS (SELECT user_id, event_type, ts, event_id,
             |        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) pts
             |        FROM events),
             |g AS (SELECT event_type, (epoch_us(ts) - epoch_us(pts))//1000000 gap_s,
             |             user_id, event_id
             |      FROM o WHERE pts IS NOT NULL),
             |r AS (SELECT event_type, gap_s,
             |        SUM(1) OVER (PARTITION BY event_type ORDER BY gap_s, user_id, event_id
             |                     ROWS UNBOUNDED PRECEDING) cum,
             |        COUNT(*) OVER (PARTITION BY event_type) tot FROM g)
             |SELECT event_type, CAST(MAX(tot) AS BIGINT) n_gaps,
             |  CAST(MIN(CASE WHEN 2*cum >= tot THEN gap_s END) AS BIGINT) med_gap_s,
             |  CAST(MIN(CASE WHEN 10*cum >= 9*tot THEN gap_s END) AS BIGINT) p90_gap_s
             |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val g = Tables.events(s, d)
          .select(col("event_type"), col("user_id"), col("event_id"),
            expr("unix_micros(ts)").as("us"),
            lag(expr("unix_micros(ts)"), 1).over(w).as("pus"))
          .filter(col("pus").isNotNull)
          .select(col("event_type"),
            expr("(us - pus) div 1000000").as("gap_s"),
            col("user_id"), col("event_id"), lit(1L).as("one"))
        // n_gaps = the quantile scan's own weight total (weights are
        // 1/gap): the checkpoint + count job + join-back are gone — the
        // prefix scan was already weighing every row (round 16)
        GroupMedian.weightedLowerQuantiles(
            g, "event_type", "gap_s", "one",
            Seq(col("user_id"), col("event_id")),
            Seq(("med_gap_s", 1, 2), ("p90_gap_s", 9, 10)), keepTotal = true)
          .select(col("event_type"), col("_gm_tot").cast("long").as("n_gaps"),
            col("med_gap_s"), col("p90_gap_s"))
          .orderBy("event_type")
      }),

    Q("q264_edit_distance_join",
      // Edit-distance <= 1 similarity join over part names WITHOUT the
      // all-pairs cross: FastSS deletion-neighborhood blocking — each
      // name keys on itself plus every single-character deletion, and
      // any two names within one edit share a key (substitution: the
      // common deletion; insert/delete: the shorter string itself). The
      // candidate equi-join is verified with the real levenshtein
      // kernel; at 100 TB the key fan-out is |name|+1 per row and the
      // blocks are bounded by how many strings share a deletion — never
      // n². The oracle brute-forces the tiny distinct-name relation.
      Some("""WITH n0 AS (SELECT DISTINCT p_name n FROM part)
             |SELECT a.n name_a, b.n name_b, CAST(levenshtein(a.n, b.n) AS BIGINT) dist
             |FROM n0 a JOIN n0 b ON a.n < b.n AND levenshtein(a.n, b.n) <= 1
             |ORDER BY name_a, name_b""".stripMargin),
      (s, d) => {
        val names = Tables.part(s, d).select(col("p_name").as("n")).distinct()
        val keyed = names.select(col("n"), explode(array_union(
            array(col("n")),
            expr("transform(sequence(1, length(n)), i -> " +
              "concat(substring(n, 1, i - 1), substring(n, i + 1, length(n))))")))
          .as("k"))
        val cand = keyed.as("a").join(keyed.as("b"),
            col("a.k") === col("b.k") && col("a.n") < col("b.n"))
          .select(col("a.n").as("name_a"), col("b.n").as("name_b"))
          .distinct()
        cand.select(col("name_a"), col("name_b"),
            levenshtein(col("name_a"), col("name_b")).cast("long").as("dist"))
          .filter(col("dist") <= 1)
          .orderBy("name_a", "name_b")
      }),

    Q("q265_expectations",
      // Deequ-style data-quality report: uniqueness, completeness,
      // range, and referential-integrity expectations over the
      // orders/lineitem pair. The three row-local lineitem checks share
      // ONE scan (a single agg of violation indicators); uniqueness is
      // count-minus-distinct; the FK check is an anti-join count. The
      // gate a pipeline runs before publishing any snapshot.
      Some("""WITH u AS (
             | SELECT 'orders.o_orderkey.unique' chk, CAST(COUNT(*) AS BIGINT) n_checked,
             |        CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) n_violations FROM orders
             | UNION ALL SELECT 'orders.o_custkey.not_null', CAST(COUNT(*) AS BIGINT),
             |        CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM orders
             | UNION ALL SELECT 'lineitem.l_quantity.in_1_50', CAST(COUNT(*) AS BIGINT),
             |        CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
             | UNION ALL SELECT 'lineitem.l_discount.in_0_10pct', CAST(COUNT(*) AS BIGINT),
             |        CAST(SUM(CASE WHEN ROUND(l_discount*100) BETWEEN 0 AND 10 THEN 0 ELSE 1 END) AS BIGINT) FROM lineitem
             | UNION ALL SELECT 'lineitem.l_orderkey.ref_orders',
             |        (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
             |        (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l LEFT JOIN orders o
             |          ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL))
             |SELECT chk, n_checked, n_violations,
             |       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT) passed
             |FROM u ORDER BY chk""".stripMargin),
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val o = Tables.orders(s, d)
        Expectations.report(Seq(
          Expectations.unique("orders.o_orderkey.unique", o, Seq("o_orderkey")),
          Expectations.rowChecks(o, Seq(
            "orders.o_custkey.not_null" -> col("o_custkey").isNull)),
          Expectations.rowChecks(li, Seq(
            "lineitem.l_quantity.in_1_50" ->
              !col("l_quantity").between(1, 50),
            "lineitem.l_discount.in_0_10pct" ->
              !round(col("l_discount") * 100).between(0, 10))),
          Expectations.referential("lineitem.l_orderkey.ref_orders",
            li, "l_orderkey", o, "o_orderkey")))
          .withColumnRenamed("check", "chk")
      }),

    Q("q266_prefix_topk",
      // Autocomplete index: the three most-ordered part names per
      // 1/2/3-char name prefix. Name popularity is one join + hash agg;
      // prefixes explode map-side (3 keys per name); the per-prefix cut
      // uses Skew.topKPerKey's two-phase bucketed top-k, so a hot
      // prefix never funnels through a single pre-cut partition. The
      // output order is total (prefix, count desc, name).
      Some("""WITH cnt AS (SELECT p_name n, CAST(COUNT(*) AS BIGINT) c
             |             FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
             |k AS (SELECT n, c, UNNEST([substr(n,1,1), substr(n,1,2), substr(n,1,3)]) pfx
             |      FROM cnt),
             |r AS (SELECT pfx, n, c,
             |        ROW_NUMBER() OVER (PARTITION BY pfx ORDER BY c DESC, n) rn FROM k)
             |SELECT pfx, n AS name, c AS n_lines FROM r WHERE rn <= 3
             |ORDER BY pfx, n_lines DESC, name""".stripMargin),
      (s, d) => {
        val cnt = Tables.lineitem(s, d)
          .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_name").as("n")).agg(count(lit(1)).cast("long").as("c"))
        val keyed = cnt.select(col("n"), col("c"),
          explode(array(substring(col("n"), 1, 1), substring(col("n"), 1, 2),
            substring(col("n"), 1, 3))).as("pfx"))
        Skew.topKPerKey(keyed, Seq(col("pfx")),
            Seq(col("c").desc, col("n")), 3)
          .select(col("pfx"), col("n").as("name"), col("c").as("n_lines"))
          .orderBy(col("pfx"), col("n_lines").desc, col("name"))
      }),

    Q("q267_wow_rate_shift",
      // Week-over-week event-rate shift per type: weekly counts (weeks
      // via date_trunc — engine-portable Monday anchor) and the ppm
      // ratio to the previous week. The lag window runs over the
      // (type, week) DOMAIN-bounded aggregate — a few hundred rows per
      // year regardless of event volume — never over raw events. The
      // spike/collapse detector behind ingestion alerting.
      Some("""WITH wv AS (SELECT event_type, CAST(DATE_TRUNC('week', ts) AS DATE) wk,
             |                   CAST(COUNT(*) AS BIGINT) n FROM events GROUP BY 1, 2),
             |l AS (SELECT event_type, wk, n,
             |        LAG(n) OVER (PARTITION BY event_type ORDER BY wk) pn FROM wv)
             |SELECT event_type, STRFTIME(wk, '%Y-%m-%d') week_start, n, pn prev_n,
             |       n*1000000//pn ratio_e6
             |FROM l WHERE pn IS NOT NULL ORDER BY event_type, week_start""".stripMargin),
      (s, d) => {
        val wv = Tables.events(s, d)
          .groupBy(col("event_type"),
            date_trunc("week", col("ts")).cast("date").as("wk"))
          .agg(count(lit(1)).cast("long").as("n"))
        val w = Window.partitionBy("event_type").orderBy("wk")
        wv.select(col("event_type"), col("wk"), col("n"),
            lag(col("n"), 1).over(w).as("pn"))
          .filter(col("pn").isNotNull)
          .select(col("event_type"),
            date_format(col("wk"), "yyyy-MM-dd").as("week_start"),
            col("n"), col("pn").as("prev_n"),
            expr("n * 1000000 div pn").as("ratio_e6"))
          .orderBy("event_type", "week_start")
      }),

    Q("q268_tvd_drift",
      // Distribution drift between the first and second temporal halves
      // of the stream, per event type: total-variation distance over
      // the q261 power-of-two value buckets — TVD = (1/2) sum |p - q|,
      // carried as the exact integer sum |c1*n2 - c2*n1| and divided
      // once at the edge (the log-free alternative to PSI/KL, bounded
      // [0, 1e6]). The midpoint anchor derives from the data (min/max
      // epoch), so the query is deterministic on any window of the
      // stream. Buckets bound the cell relation by type x 64.
      Some("""WITH b AS (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) c, ts
             |           FROM events WHERE value > 0),
             |anc AS (SELECT MIN(epoch_us(ts)) + (MAX(epoch_us(ts)) - MIN(epoch_us(ts)))//2 mid
             |        FROM b),
             |h AS (SELECT event_type, CAST(LENGTH(BIN(c)) AS BIGINT) bucket,
             |             CASE WHEN epoch_us(ts) < anc.mid THEN 0 ELSE 1 END half
             |      FROM b CROSS JOIN anc),
             |cells AS (SELECT event_type, bucket,
             |            CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) c1,
             |            CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) c2
             |          FROM h GROUP BY 1, 2),
             |t AS (SELECT event_type, SUM(c1) n1, SUM(c2) n2 FROM cells GROUP BY 1)
             |SELECT cells.event_type, CAST(t.n1 AS BIGINT) n_first,
             |       CAST(t.n2 AS BIGINT) n_second,
             |       CAST(SUM(ABS(cells.c1*t.n2 - cells.c2*t.n1))*500000//(t.n1*t.n2) AS BIGINT) tvd_e6
             |FROM cells JOIN t ON cells.event_type = t.event_type
             |GROUP BY cells.event_type, t.n1, t.n2 ORDER BY cells.event_type""".stripMargin),
      (s, d) => {
        val b = Tables.events(s, d).filter(col("value") > 0)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("c"),
            expr("unix_micros(ts)").as("us"))
        val anc = b.agg(min("us").as("mn"), max("us").as("mx"))
          .select(expr("mn + (mx - mn) div 2").as("mid"))
        val cells = b.crossJoin(broadcast(anc))
          .select(col("event_type"), length(bin(col("c"))).cast("long").as("bucket"),
            when(col("us") < col("mid"), 0).otherwise(1).as("half"))
          .groupBy("event_type", "bucket")
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).cast("long").as("c1"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).cast("long").as("c2"))
        val t = cells.groupBy(col("event_type").as("et"))
          .agg(sum("c1").as("n1"), sum("c2").as("n2"))
        cells.join(broadcast(t), col("event_type") === col("et"))
          .groupBy(col("event_type"), col("n1"), col("n2"))
          .agg(sum(abs(col("c1") * col("n2") - col("c2") * col("n1"))).as("sd"))
          .select(col("event_type"), col("n1").cast("long").as("n_first"),
            col("n2").cast("long").as("n_second"),
            expr("sd * 500000 div (n1 * n2)").as("tvd_e6"))
          .orderBy("event_type")
      })
  )
}
