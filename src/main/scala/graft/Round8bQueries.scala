package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.operators.Triangles
import graft.sources.Tables

/** Round-8 second batch: the remaining classical-analytics gaps —
  * interval-union coverage (the sweep every sessionization variant
  * reduces to), exact weighted median, per-group mode, and the local
  * clustering coefficient (the per-node closure metric over the q152
  * triangle machinery). Determinism discipline unchanged: integer
  * arithmetic end-to-end where possible, one division at the edge,
  * total tie orders. */
object Round8bQueries {

  def all: Seq[Q] = Seq(

    Q("q247_interval_coverage",
      // Union-of-intervals coverage per user: events open an interval of
      // 60 + (event_id % 300) seconds (integer-derived duration — no
      // float in the geometry), overlaps collapse via the classic sweep:
      // sort by start, take the running max of prior ends (window
      // PARTITIONED by user), clip each interval to what the past has
      // not already covered. All BIGINT epoch seconds; the total
      // covered time is exact. The "actual engaged time" metric
      // sessionization (q49) approximates with gaps.
      Some("""WITH iv AS (SELECT user_id, event_id,
             |         epoch_us(ts) // 1000000 AS s,
             |         epoch_us(ts) // 1000000 + 60 + event_id % 300 AS e
             |       FROM events),
             |w AS (SELECT user_id, s, e,
             |        MAX(e) OVER (PARTITION BY user_id ORDER BY s, event_id
             |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |          AS pmax
             |      FROM iv)
             |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             |       CAST(SUM(GREATEST(0, e - GREATEST(s, COALESCE(pmax, s)))) AS BIGINT)
             |         AS covered_secs
             |FROM w GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val iv = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts) div 1000000").as("s"),
            (expr("unix_micros(ts) div 1000000") + lit(60L)
              + col("event_id") % 300L).as("e"))
        val w = Window.partitionBy("user_id").orderBy(col("s"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        iv.select(col("user_id"),
            greatest(lit(0L),
              col("e") - greatest(col("s"),
                coalesce(max(col("e")).over(w), col("s")))).as("contrib"))
          .groupBy("user_id")
          .agg(count(lit(1)).cast("long").as("n_events"),
            sum(col("contrib")).cast("long").as("covered_secs"))
          .orderBy("user_id")
      }),

    Q("q248_weighted_median",
      // EXACT quantity-weighted median price per return flag: the
      // smallest price whose cumulative weight reaches half the total —
      // prices ride as exact cents (ROUND(x*100) is the same double op
      // in both engines), weights as BIGINT quantities, the running sum
      // in a flag-PARTITIONED window with a total tie order, and the
      // answer is a pure integer (no division anywhere). The robust
      // center q10's mean cannot give under skew.
      Some("""WITH v AS (SELECT l_returnflag AS f,
             |         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             |         CAST(l_quantity AS BIGINT) AS w,
             |         l_orderkey, l_linenumber
             |       FROM lineitem),
             |t AS (SELECT f, cents, w,
             |        SUM(w) OVER (PARTITION BY f ORDER BY cents, l_orderkey, l_linenumber
             |                     ROWS UNBOUNDED PRECEDING) AS cum,
             |        SUM(w) OVER (PARTITION BY f) AS tot
             |      FROM v)
             |SELECT f AS l_returnflag, MIN(cents) AS wmedian_cents
             |FROM t WHERE 2 * cum >= tot GROUP BY f ORDER BY l_returnflag""".stripMargin),
      (s, d) => {
        // NOT a flag-partitioned window: three group values would mean
        // three whole-table tasks at 100 TB. GroupMedian runs the same
        // 2*cum >= tot walk over ONE range-partitioned prefix scan.
        val v = Tables.lineitem(s, d)
          .select(col("l_returnflag").as("f"),
            round(col("l_extendedprice") * 100).cast("long").as("cents"),
            col("l_quantity").cast("long").as("w"),
            col("l_orderkey"), col("l_linenumber"))
        graft.operators.GroupMedian.weightedLowerMedian(v, "f", "cents", "w",
            Seq(col("l_orderkey"), col("l_linenumber")), "wmedian_cents")
          .select(col("f").as("l_returnflag"), col("wmedian_cents"))
          .orderBy("l_returnflag")
      }),

    Q("q249_mode_per_group",
      // Per-event-type MODE (most active user, ties to the smaller id):
      // counts then ONE struct-max aggregation — the (count, -id) trick
      // makes argmax-with-tiebreak a plain hash agg, no window, no
      // second shuffle. The categorical center the numeric medians
      // cannot give.
      Some("""WITH c AS (SELECT event_type, user_id, COUNT(*) AS n
             |           FROM events GROUP BY event_type, user_id)
             |SELECT event_type, user_id AS mode_user, n AS n_events
             |FROM (SELECT event_type, user_id, n,
             |        ROW_NUMBER() OVER (PARTITION BY event_type
             |                           ORDER BY n DESC, user_id) AS rn
             |      FROM c) t
             |WHERE rn = 1 ORDER BY event_type""".stripMargin),
      (s, d) => Tables.events(s, d)
        .groupBy("event_type", "user_id").agg(count(lit(1)).as("n"))
        .groupBy("event_type")
        .agg(max(struct(col("n"), (-col("user_id")).as("nu"))).as("w"))
        .select(col("event_type"), (-col("w.nu")).as("mode_user"),
          col("w.n").as("n_events"))
        .orderBy("event_type")),

    Q("q250_local_clustering",
      // Local clustering coefficient over the q152 co-order graph:
      // 2·tri(v) / (deg(v)·(deg(v)−1)) for deg ≥ 2, top-20 by
      // coefficient — how clique-like each part's neighborhood is (the
      // node-level closure metric beside q220's graph-level
      // assortativity). Reuses the degree-ordered triangle machinery
      // (each triangle counted once, no celebrity fan-out); zero-
      // triangle nodes keep their coefficient-0 rows via the left join.
      // One rounded division per node, ties to the smaller node id.
      Some("""WITH li AS (
             |  SELECT l_orderkey, l_partkey FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1996-04-01'),
             |raw AS (
             |  SELECT DISTINCT l1.l_partkey AS u, l2.l_partkey AS v
             |  FROM li l1 JOIN li l2
             |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
             |deg AS (SELECT n, COUNT(*) AS d FROM (
             |  SELECT u AS n FROM raw UNION ALL SELECT v FROM raw) GROUP BY n),
             |o AS (SELECT CASE WHEN du.d <= dv.d THEN raw.u ELSE raw.v END AS s,
             |             CASE WHEN du.d <= dv.d THEN raw.v ELSE raw.u END AS t
             |      FROM raw JOIN deg du ON du.n = raw.u JOIN deg dv ON dv.n = raw.v),
             |tri AS (SELECT e1.s AS a, e1.t AS b, e2.t AS c
             |        FROM o e1 JOIN o e2 ON e1.s = e2.s AND e1.t <> e2.t
             |        JOIN o e3 ON e3.s = e1.t AND e3.t = e2.t),
             |pn AS (SELECT node, COUNT(*) AS tri_cnt FROM (
             |  SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
             |  UNION ALL SELECT c FROM tri) GROUP BY node)
             |SELECT deg.n AS node, CAST(deg.d AS BIGINT) AS degree,
             |       CAST(COALESCE(pn.tri_cnt, 0) AS BIGINT) AS tri_cnt,
             |       ROUND(2.0 * COALESCE(pn.tri_cnt, 0) / (deg.d * (deg.d - 1.0)), 4)
             |         AS coef
             |FROM deg LEFT JOIN pn ON pn.node = deg.n
             |WHERE deg.d >= 2
             |ORDER BY coef DESC, node LIMIT 20""".stripMargin),
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .select("l_orderkey", "l_partkey")
        val edges = li.as("l1").join(li.as("l2"),
            col("l1.l_orderkey") === col("l2.l_orderkey") &&
              col("l1.l_partkey") < col("l2.l_partkey"))
          .select(col("l1.l_partkey").as("src"), col("l2.l_partkey").as("dst"))
          .distinct()
        val deg = edges.select(col("src").as("n"))
          .unionAll(edges.select(col("dst").as("n")))
          .groupBy("n").agg(count(lit(1)).as("d"))
        val tri = Triangles.perNode(edges, "src", "dst")
        deg.join(tri, deg("n") === tri("node"), "left")
          .filter(col("d") >= 2)
          .select(col("n").as("node"), col("d").cast("long").as("degree"),
            coalesce(col("tri_cnt"), lit(0L)).cast("long").as("tri_cnt"),
            round(lit(2.0) * coalesce(col("tri_cnt"), lit(0L))
              / (col("d") * (col("d") - lit(1.0))), 4).as("coef"))
          .orderBy(col("coef").desc, col("node")).limit(20)
      })
  )
}
