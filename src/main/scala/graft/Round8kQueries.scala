package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.operators.{GlobalOrder, GroupMedian}
import graft.sources.Tables

/** Round-8 eleventh batch: inequality and fan-out profiling closers —
  * per-nation upper-quartile membership, the exact Gini coefficient of
  * customer revenue (the scalar q271's Lorenz curve integrates to),
  * and the order fan-out histogram with its dispersion index (the
  * join-planning statistic behind every skew decision). */
object Round8kQueries {

  def all: Seq[Q] = Seq(

    Q("q285_upper_quartile_segment",
      // Per-nation upper-quartile spend membership: nearest-rank p75 of
      // per-customer order totals (25 nations — low-cardinality, so the
      // quantile runs through GroupMedian's prefix scan, never a
      // nation-partitioned window) and how many customers sit at or
      // above it. The segment-sizing cut behind q270's global RFM.
      Some("""WITH sp AS (SELECT c.c_nationkey nk, c.c_custkey ck,
             |        CAST(SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT)) AS BIGINT) cents
             |      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
             |      GROUP BY 1, 2),
             |r AS (SELECT nk, ck, cents,
             |        SUM(1) OVER (PARTITION BY nk ORDER BY cents, ck
             |                     ROWS UNBOUNDED PRECEDING) cum,
             |        COUNT(*) OVER (PARTITION BY nk) tot FROM sp),
             |q3 AS (SELECT nk, MIN(CASE WHEN 4*cum >= 3*tot THEN cents END) p75
             |       FROM r GROUP BY nk)
             |SELECT sp.nk AS c_nationkey, CAST(COUNT(*) AS BIGINT) n_cust,
             |       CAST(q3.p75 AS BIGINT) p75_cents,
             |       CAST(SUM(CASE WHEN sp.cents >= q3.p75 THEN 1 ELSE 0 END) AS BIGINT) n_upper
             |FROM sp JOIN q3 ON sp.nk = q3.nk
             |GROUP BY sp.nk, q3.p75 ORDER BY c_nationkey""".stripMargin),
      (s, d) => {
        val sp = Tables.customer(s, d)
          .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("nk"), col("c_custkey").as("ck"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .cast("long").as("cents"))
          .localCheckpoint(true) // quantile pass + membership agg share it
        val q3 = GroupMedian.weightedLowerQuantile(
          sp.withColumn("one", lit(1L)), "nk", "cents", "one",
          Seq(col("ck")), "p75", 3, 4)
        sp.join(broadcast(q3), "nk")
          .groupBy(col("nk").as("c_nationkey"), col("p75"))
          .agg(count(lit(1)).cast("long").as("n_cust"),
            sum(when(col("cents") >= col("p75"), 1L).otherwise(0L))
              .cast("long").as("n_upper"))
          .select(col("c_nationkey"), col("n_cust"),
            col("p75").cast("long").as("p75_cents"), col("n_upper"))
          .orderBy("c_nationkey")
      }),

    Q("q286_revenue_gini",
      // Exact Gini coefficient of per-customer revenue via the rank
      // formula G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n over the
      // ascending order — ranks from GlobalOrder's range-partitioned
      // pass (the SQL window form is oracle-only), the rank-weighted
      // sum carried as decimal(38,0)/HUGEINT (rn*cents overflows BIGINT
      // summed at sf1 scale), ONE fixed IEEE expression at the edge.
      // The scalar summary of q271's Lorenz curve.
      Some("""WITH sp AS (SELECT o_custkey,
             |         CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) cents
             |       FROM orders GROUP BY 1),
             |r AS (SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_custkey) rn FROM sp),
             |t AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(cents) AS BIGINT) s,
             |             CAST(SUM(rn*cents) AS DOUBLE) rs FROM r)
             |SELECT n, s, ROUND((2.0*rs)/(CAST(n AS DOUBLE)*CAST(s AS DOUBLE))
             |       - (CAST(n AS DOUBLE)+1)/CAST(n AS DOUBLE), 6) gini
             |FROM t""".stripMargin),
      (s, d) => {
        val sp = Tables.orders(s, d)
          .groupBy("o_custkey")
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .cast("long").as("cents"))
        val r = GlobalOrder.rowNumber(sp,
          Seq(col("cents"), col("o_custkey")), "rn")
        r.agg(count(lit(1)).cast("long").as("n"),
            sum("cents").cast("long").as("s"),
            sum((col("rn") * col("cents")).cast("decimal(38,0)"))
              .cast("double").as("rs"))
          .select(col("n"), col("s"),
            round((lit(2.0) * col("rs"))
              / (col("n").cast("double") * col("s").cast("double"))
              - (col("n").cast("double") + 1) / col("n").cast("double"), 6)
              .as("gini"))
      }),

    Q("q287_order_fanout",
      // Lines-per-order histogram plus the corpus dispersion index
      // (variance-to-mean of the fan-out — the q272 Fano machinery
      // pointed at join planning: under-dispersed fan-out means uniform
      // per-key join cost, over-dispersed means operators/Skew earns
      // its keep). Histogram bounded by the max fan-out; the index is
      // one integer expression off three exact sums.
      Some("""WITH f AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) k
             |           FROM lineitem GROUP BY 1),
             |h AS (SELECT k, CAST(COUNT(*) AS BIGINT) n_orders FROM f GROUP BY k),
             |t AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(k) AS BIGINT) s,
             |             CAST(SUM(k*k) AS BIGINT) s2 FROM f)
             |SELECT h.k AS lines_per_order, h.n_orders,
             |       CAST(t.n AS BIGINT) n_total,
             |       (t.n*t.s2 - t.s*t.s)*1000000//(t.n*t.s) dispersion_e6
             |FROM h CROSS JOIN t ORDER BY lines_per_order""".stripMargin),
      (s, d) => {
        val f = Tables.lineitem(s, d)
          .groupBy("l_orderkey").agg(count(lit(1)).cast("long").as("k"))
        val h = f.groupBy("k").agg(count(lit(1)).cast("long").as("n_orders"))
        val t = f.agg(count(lit(1)).cast("long").as("n"),
          sum("k").cast("long").as("s"),
          sum(col("k") * col("k")).cast("long").as("s2"))
        h.crossJoin(broadcast(t))
          .select(col("k").as("lines_per_order"), col("n_orders"),
            col("n").as("n_total"),
            expr("(n*s2 - s*s)*1000000 div (n*s)").as("dispersion_e6"))
          .orderBy("lines_per_order")
      })
  )
}
