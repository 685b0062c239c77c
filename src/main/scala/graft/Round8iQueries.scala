package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Queries.Q
import graft.operators.GroupMedian
import graft.sources.Tables

/** Round-8 ninth batch: robust trend, risk, and experimentation — the
  * Theil-Sen median slope over a consistent bounded sample, per-user
  * max drawdown, and a two-proportion A/B readout. The Theil-Sen query
  * is the third member of the consistent-sample family (q188 select,
  * q276 matching, now robust regression): the md5-priority sample
  * makes the O(k²) pair set CONSTANT at any corpus scale. */
object Round8iQueries {

  def all: Seq[Q] = Seq(

    Q("q281_theil_sen_slope",
      // Theil-Sen estimator: the MEDIAN of pairwise slopes of purchase
      // value over time, on the md5-priority 200-sample — the robust
      // trend line one outlier cannot bend (q119's least-squares
      // regression is the fragile twin). Slopes are floor-scaled
      // integer micro-units (cents/sec * 1e6, one integer division per
      // pair); the median runs through GroupMedian's prefix scan, not
      // a partition-less window. Pairs with equal timestamps are
      // excluded (undefined slope), exactly as Sen defines it.
      Some("""WITH smp AS (SELECT event_id, epoch_us(ts)//1000000 t,
             |               CAST(ROUND(value*100) AS BIGINT) c
             |             FROM events WHERE event_type = 'purchase'
             |             ORDER BY MD5(CAST(event_id AS VARCHAR)), event_id LIMIT 200),
             |p AS (SELECT a.event_id ia, b.event_id ib,
             |        (b.c - a.c)*1000000//(b.t - a.t) slope_e6
             |      FROM smp a JOIN smp b ON a.t < b.t),
             |r AS (SELECT slope_e6, ia, ib,
             |        SUM(1) OVER (ORDER BY slope_e6, ia, ib ROWS UNBOUNDED PRECEDING) cum,
             |        COUNT(*) OVER () tot FROM p)
             |SELECT CAST(MAX(tot) AS BIGINT) n_pairs,
             |       CAST(MIN(CASE WHEN 2*cum >= tot THEN slope_e6 END) AS BIGINT) median_slope_e6
             |FROM r""".stripMargin),
      (s, d) => {
        val smp = Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(col("event_id"), expr("unix_micros(ts) div 1000000").as("t"),
            round(col("value") * 100).cast("long").as("c"))
          .orderBy(md5(col("event_id").cast("string")), col("event_id"))
          .limit(200)
        val p = smp.as("a").join(broadcast(smp.as("b")), col("a.t") < col("b.t"))
          .select(col("a.event_id").as("ia"), col("b.event_id").as("ib"),
            expr("(b.c - a.c) * 1000000 div (b.t - a.t)").as("slope_e6"),
            lit("all").as("g"), lit(1L).as("one"))
        // n_pairs = the median scan's own weight total (weights are 1/pair)
        // — the second pass over the pairwise join it used to pay is gone
        GroupMedian.weightedLowerQuantile(p, "g", "slope_e6", "one",
            Seq(col("ia"), col("ib")), "median_slope_e6", 1, 2, keepTotal = true)
          .select(col("_gm_tot").cast("long").as("n_pairs"), col("median_slope_e6"))
      }),

    Q("q282_max_drawdown",
      // Per-user maximum drawdown of the transaction-value sequence
      // (largest drop from a running peak — the risk/volatility lens on
      // the event stream): running max over the USER-partitioned time
      // order (users are the parallelism), then one hash agg. Integer
      // cents end to end; top-25 under a total order.
      Some("""WITH v AS (SELECT user_id, CAST(ROUND(value*100) AS BIGINT) c,
             |                  ts, event_id FROM events),
             |r AS (SELECT user_id, c,
             |        MAX(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                     ROWS UNBOUNDED PRECEDING) runmax
             |      FROM v),
             |d AS (SELECT user_id, CAST(MAX(runmax - c) AS BIGINT) max_drawdown_cents
             |      FROM r GROUP BY user_id)
             |SELECT user_id, max_drawdown_cents FROM d
             |ORDER BY max_drawdown_cents DESC, user_id LIMIT 25""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), round(col("value") * 100).cast("long").as("c"),
            col("ts"), col("event_id"))
          .withColumn("runmax", max(col("c")).over(w))
          .groupBy("user_id")
          .agg(max(col("runmax") - col("c")).cast("long").as("max_drawdown_cents"))
          .orderBy(col("max_drawdown_cents").desc, col("user_id")).limit(25)
      }),

    Q("q283_ab_readout",
      // Two-proportion experiment readout: even/odd user ids as the
      // A/B split, conversion = any purchase >= $250. Rates in exact
      // ppm; the pooled two-proportion z-statistic is ONE fixed IEEE
      // expression over four integers (identical association in both
      // engines, NaN when nobody or everybody converts — both engines
      // surface the same null). Per-user flags are a map-side agg;
      // everything after is a 2-row reduction.
      Some("""WITH u AS (SELECT user_id, CAST(user_id % 2 AS BIGINT) grp,
             |        MAX(CASE WHEN event_type = 'purchase' AND value >= 250
             |                 THEN 1 ELSE 0 END) conv
             |      FROM events GROUP BY user_id),
             |a AS (SELECT grp, CAST(COUNT(*) AS BIGINT) n, CAST(SUM(conv) AS BIGINT) k
             |      FROM u GROUP BY grp),
             |w AS (SELECT MAX(CASE WHEN grp=0 THEN n END) n0, MAX(CASE WHEN grp=0 THEN k END) k0,
             |             MAX(CASE WHEN grp=1 THEN n END) n1, MAX(CASE WHEN grp=1 THEN k END) k1
             |      FROM a)
             |SELECT n0, k0, n1, k1,
             |  k0*1000000//n0 rate0_e6, k1*1000000//n1 rate1_e6,
             |  ROUND((CAST(k1 AS DOUBLE)/CAST(n1 AS DOUBLE) - CAST(k0 AS DOUBLE)/CAST(n0 AS DOUBLE))
             |    / SQRT((CAST(k0+k1 AS DOUBLE)/CAST(n0+n1 AS DOUBLE))
             |           * (1 - CAST(k0+k1 AS DOUBLE)/CAST(n0+n1 AS DOUBLE))
             |           * (1/CAST(n0 AS DOUBLE) + 1/CAST(n1 AS DOUBLE))), 4) z_stat
             |FROM w""".stripMargin),
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase" && col("value") >= 250, 1)
            .otherwise(0)).as("conv"))
          .select((col("user_id") % 2).cast("long").as("grp"), col("conv"))
        val a = u.groupBy("grp")
          .agg(count(lit(1)).cast("long").as("n"), sum("conv").cast("long").as("k"))
        val w = a.agg(
          max(when(col("grp") === 0, col("n"))).as("n0"),
          max(when(col("grp") === 0, col("k"))).as("k0"),
          max(when(col("grp") === 1, col("n"))).as("n1"),
          max(when(col("grp") === 1, col("k"))).as("k1"))
        w.select(col("n0"), col("k0"), col("n1"), col("k1"),
          expr("k0*1000000 div n0").as("rate0_e6"),
          expr("k1*1000000 div n1").as("rate1_e6"),
          round((col("k1").cast("double") / col("n1").cast("double")
              - col("k0").cast("double") / col("n0").cast("double"))
            / sqrt(((col("k0") + col("k1")).cast("double")
                / (col("n0") + col("n1")).cast("double"))
              * (lit(1) - (col("k0") + col("k1")).cast("double")
                / (col("n0") + col("n1")).cast("double"))
              * (lit(1) / col("n0").cast("double")
                + lit(1) / col("n1").cast("double"))), 4).as("z_stat"))
      })
  )
}
