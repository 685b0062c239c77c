package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.operators.GroupPrefix
import graft.sources.Tables

/** Round-8 fourteenth batch: the nonparametric family completed —
  * Wilcoxon signed-rank (the PAIRED test beside q293's two-sample U),
  * a Benford first-digit gate (the classic books-cooking / synthetic-
  * data screen, expected shares as integer ppm literals so no log()
  * ever executes), and Spearman rho (Pearson on exact doubled
  * midranks — with q251 and q294 the correlation family is Pearson /
  * Kendall / Spearman complete). */
object Round8nQueries {

  def all: Seq[Q] = Seq(

    Q("q295_wilcoxon_signed_rank",
      // Wilcoxon signed-rank on paired first-vs-last purchase values
      // per user (did spend move?): zero diffs drop (Wilcoxon's own
      // rule), |diff| midranks come from the value-domain counts via
      // GroupPrefix, and W+ rides DOUBLED like q293's U so midrank
      // halves stay integer; W+ + W- = n(n+1) is structural. First/last
      // picks are min/max over the total (ts, event_id) order, so
      // equal-timestamp rows cannot fork the fixture.
      Some("""WITH pv AS (SELECT user_id, ts, event_id, CAST(ROUND(value*100) AS BIGINT) c,
             |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn,
             |         COUNT(*) OVER (PARTITION BY user_id) cnt
             |       FROM events WHERE event_type = 'purchase'),
             |fv AS (SELECT user_id, c FROM pv WHERE rn = 1 AND cnt > 1),
             |lv AS (SELECT user_id, c FROM pv WHERE rn = cnt AND cnt > 1),
             |d AS (SELECT fv.user_id, lv.c - fv.c diff
             |      FROM fv JOIN lv ON fv.user_id = lv.user_id WHERE lv.c <> fv.c),
             |c AS (SELECT ABS(diff) ad,
             |             CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT) cp,
             |             CAST(COUNT(*) AS BIGINT) ct FROM d GROUP BY 1),
             |w AS (SELECT ad, cp, ct,
             |        COALESCE(SUM(ct) OVER (ORDER BY ad
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) pre
             |      FROM c),
             |t AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM d),
             |s AS (SELECT SUM(cp*(2*pre + ct + 1)) wp2 FROM w)
             |SELECT t.n n_pairs, CAST(s.wp2 AS BIGINT) w_plus_x2,
             |       CAST(t.n*(t.n+1) - s.wp2 AS BIGINT) w_minus_x2
             |FROM t CROSS JOIN s""".stripMargin),
      (s, d) => {
        val pv = Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"), expr("unix_micros(ts)").as("us"),
            col("event_id"), round(col("value") * 100).cast("long").as("c"))
        val fl = pv.groupBy("user_id")
          .agg(count(lit(1)).as("cnt"),
            min(struct(col("us"), col("event_id"), col("c"))).as("f"),
            max(struct(col("us"), col("event_id"), col("c"))).as("l"))
          .filter(col("cnt") > 1)
          .select((col("l.c") - col("f.c")).as("diff"))
          .filter(col("diff") =!= 0)
        val c = fl.groupBy(abs(col("diff")).as("ad"))
          .agg(sum(when(col("diff") > 0, 1L).otherwise(0L)).as("cp"),
            count(lit(1)).as("ct"))
        val w = GroupPrefix.exclusiveRunningSum(
          c.withColumn("g", lit("all")), "g", Seq(col("ad")), "ct", "pre")
        val t = fl.agg(count(lit(1)).cast("long").as("n"))
        val rs = w.agg(sum(col("cp") * (col("pre") * 2 + col("ct") + 1)).as("wp2"))
        broadcast(t).crossJoin(broadcast(rs))
          .select(col("n").as("n_pairs"), col("wp2").cast("long").as("w_plus_x2"),
            (col("n") * (col("n") + 1) - col("wp2")).cast("long").as("w_minus_x2"))
      }),

    Q("q296_benford_gate",
      // Benford first-digit screen over order totals: observed ppm
      // share per leading digit vs the Benford expectation carried as
      // INTEGER ppm literals (log10(1+1/d) precomputed once, so no
      // transcendental ever executes in either engine) and the signed
      // deviation. A natural multi-magnitude amount column tracks
      // Benford; flat synthetic generators (like this testdata —
      // the point of a gate) deviate loudly.
      Some("""WITH fd AS (SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice*100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) dgt
             |            FROM orders WHERE o_totalprice > 0),
             |c AS (SELECT dgt, CAST(COUNT(*) AS BIGINT) n FROM fd GROUP BY dgt),
             |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091), (3, 124939), (4, 96910),
             |        (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757)) v(dgt, exp_e6)),
             |t AS (SELECT CAST(SUM(n) AS BIGINT) tot FROM c)
             |SELECT e.dgt AS first_digit, CAST(COALESCE(c.n, 0) AS BIGINT) n,
             |       COALESCE(c.n, 0)*1000000//t.tot obs_e6, CAST(e.exp_e6 AS BIGINT) benford_e6,
             |       COALESCE(c.n, 0)*1000000//t.tot - e.exp_e6 dev_e6
             |FROM e LEFT JOIN c ON c.dgt = e.dgt CROSS JOIN t ORDER BY first_digit""".stripMargin),
      (s, d) => {
        val benford = Seq(1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
          5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)
        val c = Tables.orders(s, d).filter(col("o_totalprice") > 0)
          .select(substring(round(col("o_totalprice") * 100).cast("long")
            .cast("string"), 1, 1).cast("long").as("dgt"))
          .groupBy("dgt").agg(count(lit(1)).cast("long").as("n"))
        val t = c.agg(sum("n").cast("long").as("tot"))
        val e = c.sparkSession.createDataFrame(benford.map(x => (x._1.toLong, x._2)))
          .toDF("dgt", "exp_e6")
        e.join(c, Seq("dgt"), "left").crossJoin(broadcast(t))
          .select(col("dgt").as("first_digit"),
            coalesce(col("n"), lit(0L)).as("n"),
            expr("coalesce(n, 0) * 1000000 div tot").as("obs_e6"),
            col("exp_e6").as("benford_e6"),
            expr("coalesce(n, 0) * 1000000 div tot - exp_e6").as("dev_e6"))
          .orderBy("first_digit")
      }),

    Q("q297_spearman_rho",
      // Spearman rank correlation between document char length and
      // token count: exact DOUBLED midranks per axis (value-domain
      // counts + GroupPrefix — rho is invariant to the x2 scaling),
      // then q251's closed-form Pearson over the rank sums, carried as
      // decimal(38,0)/HUGEINT so rank products never overflow. With
      // q251 (Pearson) and q294 (Kendall) the correlation family is
      // complete; near-+1 here is the sanity anchor (tokens/chars are
      // almost affine).
      Some("""WITH v AS (SELECT doc_id, CAST(n_chars AS BIGINT) x,
             |        CAST(LEN(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), s -> LEN(s) > 0)) AS BIGINT) y
             |      FROM documents),
             |rx AS (SELECT x, COUNT(*) cnt FROM v GROUP BY x),
             |wx AS (SELECT x, 2*COALESCE(SUM(cnt) OVER (ORDER BY x
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1 r2 FROM rx),
             |ry AS (SELECT y, COUNT(*) cnt FROM v GROUP BY y),
             |wy AS (SELECT y, 2*COALESCE(SUM(cnt) OVER (ORDER BY y
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1 r2 FROM ry),
             |j AS (SELECT wx.r2 a, wy.r2 b FROM v JOIN wx ON v.x = wx.x JOIN wy ON v.y = wy.y),
             |agg AS (SELECT CAST(COUNT(*) AS DOUBLE) n, CAST(SUM(a) AS DOUBLE) sa,
             |          CAST(SUM(b) AS DOUBLE) sb, CAST(SUM(a*b) AS DOUBLE) sab,
             |          CAST(SUM(a*a) AS DOUBLE) saa, CAST(SUM(b*b) AS DOUBLE) sbb FROM j)
             |SELECT CAST(n AS BIGINT) n_docs,
             |  ROUND((n*sab - sa*sb)/(SQRT(n*saa - sa*sa)*SQRT(n*sbb - sb*sb)), 6) spearman_rho
             |FROM agg""".stripMargin),
      (s, d) => {
        // materialized once (round 16): three consumers (both rank
        // relations + the final join) would otherwise each re-scan and
        // re-tokenize the corpus; the relation is three longs per doc
        val v = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars").cast("long").as("x"),
            size(graft.operators.TextAnalysis.tokens(col("text")))
              .cast("long").as("y"))
          .localCheckpoint(true)
        def rank2(valueCol: String): org.apache.spark.sql.DataFrame = {
          val cnts = v.groupBy(valueCol).agg(count(lit(1)).as("cnt"))
          GroupPrefix.exclusiveRunningSum(
              cnts.withColumn("g", lit("all")), "g", Seq(col(valueCol)), "cnt", "pre")
            .select(col(valueCol), (col("pre") * 2 + col("cnt") + 1).as("r2"))
        }
        def dsum38(c: org.apache.spark.sql.Column) =
          sum(c.cast("decimal(38,0)")).cast("double")
        val j = v.join(broadcast(rank2("x").withColumnRenamed("r2", "a")), "x")
          .join(broadcast(rank2("y").withColumnRenamed("r2", "b")), "y")
        j.agg(count(lit(1)).cast("double").as("n"),
            dsum38(col("a")).as("sa"), dsum38(col("b")).as("sb"),
            dsum38(col("a") * col("b")).as("sab"),
            dsum38(col("a") * col("a")).as("saa"),
            dsum38(col("b") * col("b")).as("sbb"))
          .select(col("n").cast("long").as("n_docs"),
            round((col("n") * col("sab") - col("sa") * col("sb"))
              / (sqrt(col("n") * col("saa") - col("sa") * col("sa"))
                * sqrt(col("n") * col("sbb") - col("sb") * col("sb"))), 6)
              .as("spearman_rho"))
      })
  )
}
