package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.sources.Tables

/** Round-8 fifteenth batch (the 300 close): time-series serial
  * correlation, seasonality strength, and the cell-level contingency
  * lift matrix. One portability lesson is baked in here: q299 surfaces
  * its ratio as ROUND(x, 4) DOUBLE because CAST(double AS BIGINT)
  * ROUNDS in DuckDB but TRUNCATES in Spark — the one cast the
  * determinism contract must never use on a non-integer. */
object Round8oQueries {

  def all: Seq[Q] = Seq(

    Q("q298_acf_lag1",
      // Lag-1 autocorrelation of the daily order count series: the
      // consecutive-day pairs come from an EQUI-join on day+1 (never a
      // global window — gap days simply drop, which is also the honest
      // semantics), then q251's closed-form Pearson. Near zero on this
      // synthetic feed — the point of the diagnostic is detecting
      // momentum/weekly structure in real arrival streams.
      Some("""WITH dc AS (SELECT CAST(o_orderdate AS DATE) dd, CAST(COUNT(*) AS BIGINT) n
             |            FROM orders GROUP BY 1),
             |p AS (SELECT a.n x, b.n y FROM dc a JOIN dc b ON b.dd = a.dd + INTERVAL 1 DAY),
             |agg AS (SELECT CAST(COUNT(*) AS DOUBLE) n, CAST(SUM(x) AS DOUBLE) sx,
             |          CAST(SUM(y) AS DOUBLE) sy, CAST(SUM(x*y) AS DOUBLE) sxy,
             |          CAST(SUM(x*x) AS DOUBLE) sxx, CAST(SUM(y*y) AS DOUBLE) syy FROM p)
             |SELECT CAST(n AS BIGINT) n_pairs,
             |  ROUND((n*sxy - sx*sy)/(SQRT(n*sxx - sx*sx)*SQRT(n*syy - sy*sy)), 6) acf1
             |FROM agg""".stripMargin),
      (s, d) => {
        val dc = Tables.orders(s, d)
          .groupBy(col("o_orderdate").cast("date").as("dd"))
          .agg(count(lit(1)).cast("long").as("n"))
        def dsum38(c: org.apache.spark.sql.Column) =
          sum(c.cast("decimal(38,0)")).cast("double")
        val p = dc.as("a").join(dc.as("b"),
            col("b.dd") === date_add(col("a.dd"), 1))
          .select(col("a.n").as("x"), col("b.n").as("y"))
        p.agg(count(lit(1)).cast("double").as("n"),
            dsum38(col("x")).as("sx"), dsum38(col("y")).as("sy"),
            dsum38(col("x") * col("y")).as("sxy"),
            dsum38(col("x") * col("x")).as("sxx"),
            dsum38(col("y") * col("y")).as("syy"))
          .select(col("n").cast("long").as("n_pairs"),
            round((col("n") * col("sxy") - col("sx") * col("sy"))
              / (sqrt(col("n") * col("sxx") - col("sx") * col("sx"))
                * sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
              .as("acf1"))
      }),

    Q("q299_seasonality_strength",
      // How much of the value variance the hour-of-week profile
      // explains: the one-way ANOVA R² (between-slot sum of squares
      // over total, in ppm) over the 168-slot domain. Slot terms
      // ss²/ns are ONE double division each, re-summed as
      // decimal(30,8); the ratio leaves as ROUND(x, 4) DOUBLE — never
      // CAST to BIGINT, which rounds in DuckDB and truncates in Spark.
      // The scalar that says whether q259's profile is signal or noise.
      Some("""WITH v AS (SELECT CAST(EXTRACT(ISODOW FROM ts) AS BIGINT)*100
             |                  + CAST(EXTRACT(HOUR FROM ts) AS BIGINT) slot,
             |                  CAST(ROUND(value*100) AS BIGINT) c FROM events),
             |sl AS (SELECT slot, CAST(COUNT(*) AS BIGINT) ns, CAST(SUM(c) AS BIGINT) ss
             |       FROM v GROUP BY slot),
             |t AS (SELECT CAST(SUM(ns) AS BIGINT) n, CAST(SUM(ss) AS BIGINT) s FROM sl),
             |x2 AS (SELECT CAST(SUM(c*c) AS DOUBLE) sxx FROM v),
             |b AS (SELECT CAST(SUM(CAST(CAST(ss AS DOUBLE)*CAST(ss AS DOUBLE)/CAST(ns AS DOUBLE)
             |                 AS DECIMAL(30,8))) AS DOUBLE) sb FROM sl)
             |SELECT t.n n_events,
             |  ROUND((b.sb - CAST(t.s AS DOUBLE)*CAST(t.s AS DOUBLE)/CAST(t.n AS DOUBLE))*1000000
             |        / (x2.sxx - CAST(t.s AS DOUBLE)*CAST(t.s AS DOUBLE)/CAST(t.n AS DOUBLE)), 4) seasonal_ppm
             |FROM t CROSS JOIN x2 CROSS JOIN b""".stripMargin),
      (s, d) => {
        val v = Tables.events(s, d).select(
          ((expr("weekday(ts)") + 1).cast("long") * 100
            + hour(col("ts")).cast("long")).as("slot"),
          round(col("value") * 100).cast("long").as("c"))
        val sl = v.groupBy("slot")
          .agg(count(lit(1)).cast("long").as("ns"), sum("c").cast("long").as("ss"))
        val t = sl.agg(sum("ns").cast("long").as("n"), sum("ss").cast("long").as("s"))
        val x2 = v.agg(sum((col("c") * col("c")).cast("decimal(38,0)"))
          .cast("double").as("sxx"))
        val b = sl.select((col("ss").cast("double") * col("ss").cast("double")
            / col("ns").cast("double")).cast("decimal(30,8)").as("term"))
          .agg(sum("term").cast("double").as("sb"))
        broadcast(t).crossJoin(broadcast(x2)).crossJoin(broadcast(b))
          .select(col("n").as("n_events"),
            round((col("sb") - col("s").cast("double") * col("s").cast("double")
                / col("n").cast("double")) * 1000000
              / (col("sxx") - col("s").cast("double") * col("s").cast("double")
                / col("n").cast("double")), 4).as("seasonal_ppm"))
      }),

    Q("q300_contingency_lift",
      // The cell-level contingency view q252's chi-square summarizes:
      // per (source, lang) cell the observed count, the expected count
      // in micro-units (rs*cs*1e6 div n — exact integer), and the lift
      // in ppm (o*n*1e6 div rs*cs). Lift >> 1e6 marks the
      // source-language affinities a mixture planner reads directly;
      // one hash agg plus broadcast marginals, all integers.
      Some("""WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) o
             |           FROM documents GROUP BY 1, 2),
             |r AS (SELECT source, SUM(o) rs FROM c GROUP BY 1),
             |l AS (SELECT lang, SUM(o) cs FROM c GROUP BY 1),
             |t AS (SELECT SUM(o) n FROM c)
             |SELECT c.source, c.lang, c.o,
             |       CAST(r.rs*l.cs*1000000//t.n AS BIGINT) exp_micro,
             |       CAST(c.o*t.n*1000000//(r.rs*l.cs) AS BIGINT) lift_e6
             |FROM c JOIN r ON c.source = r.source JOIN l ON c.lang = l.lang
             |CROSS JOIN t ORDER BY c.source, c.lang""".stripMargin),
      (s, d) => {
        val c = Tables.documents(s, d)
          .groupBy("source", "lang").agg(count(lit(1)).cast("long").as("o"))
        val r = c.groupBy("source").agg(sum("o").as("rs"))
        val l = c.groupBy("lang").agg(sum("o").as("cs"))
        val t = c.agg(sum("o").as("n"))
        c.join(broadcast(r), "source").join(broadcast(l), "lang")
          .crossJoin(broadcast(t))
          .select(col("source"), col("lang"), col("o"),
            expr("rs * cs * 1000000 div n").as("exp_micro"),
            expr("o * n * 1000000 div (rs * cs)").as("lift_e6"))
          .orderBy("source", "lang")
      })
  )
}
