package graft

import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.sources.Tables

/** Round-8 twelfth batch: balance and concentration audits — the
  * class-balance report every supervised dataset ships with, and
  * Herfindahl market concentration (the square-of-shares dual of
  * q286's Gini). Same arithmetic discipline: integer counts/cents,
  * one deterministic double op per term, decimal re-summation so the
  * totals are order-free. */
object Round8lQueries {

  def all: Seq[Q] = Seq(

    Q("q288_label_balance",
      // Class-balance audit over the embedding labels: class count,
      // min/max class sizes, the max/min imbalance ratio in ppm, and
      // the chi-square statistic against the uniform expectation
      // (per-class term (k*n - tot)^2/(k*tot): integer numerator, ONE
      // double division, decimal(28,12) re-sum). The first table a
      // supervised-training report prints; k is the bounded label
      // domain, so everything after the count agg is k rows.
      Some("""WITH c AS (SELECT CAST(label AS BIGINT) lbl, CAST(COUNT(*) AS BIGINT) n
             |           FROM embeddings GROUP BY 1),
             |t AS (SELECT CAST(SUM(n) AS BIGINT) tot, CAST(COUNT(*) AS BIGINT) k,
             |             CAST(MAX(n) AS BIGINT) mx, CAST(MIN(n) AS BIGINT) mn FROM c),
             |chi AS (SELECT CAST(SUM(CAST(CAST(k*n - tot AS DOUBLE)*CAST(k*n - tot AS DOUBLE)
             |                 /(CAST(k AS DOUBLE)*CAST(tot AS DOUBLE)) AS DECIMAL(28,12))) AS DOUBLE) chi2
             |        FROM c CROSS JOIN t)
             |SELECT t.k n_classes, t.tot n_rows, t.mn min_class, t.mx max_class,
             |       t.mx*1000000//t.mn imbalance_e6,
             |       ROUND(chi.chi2, 6) chi2_uniform
             |FROM t CROSS JOIN chi""".stripMargin),
      (s, d) => {
        val c = Tables.embeddings(s, d)
          .groupBy(col("label").cast("long").as("lbl"))
          .agg(count(lit(1)).cast("long").as("n"))
        val t = c.agg(sum("n").cast("long").as("tot"),
          count(lit(1)).cast("long").as("k"),
          max("n").cast("long").as("mx"), min("n").cast("long").as("mn"))
        val chi = c.crossJoin(broadcast(t))
          .select((((col("k") * col("n") - col("tot")).cast("double")
            * (col("k") * col("n") - col("tot")).cast("double"))
            / (col("k").cast("double") * col("tot").cast("double")))
            .cast("decimal(28,12)").as("term"))
          .agg(sum("term").cast("double").as("chi2"))
        broadcast(t).crossJoin(broadcast(chi))
          .select(col("k").as("n_classes"), col("tot").as("n_rows"),
            col("mn").as("min_class"), col("mx").as("max_class"),
            expr("mx*1000000 div mn").as("imbalance_e6"),
            round(col("chi2"), 6).as("chi2_uniform"))
      }),

    Q("q289_brand_hhi",
      // Herfindahl-Hirschman supplier concentration per brand: HHI =
      // sum of squared revenue shares (1/n = perfect competition, 1 =
      // monopoly) — the square-of-shares dual of q286's Gini, per
      // brand. Per-(brand, supplier) cents are exact; each share² is
      // one deterministic double product re-summed as decimal(28,14).
      // One join + two hash aggs; the totals broadcast back.
      Some("""WITH r AS (SELECT p.p_brand brand, l.l_suppkey sk,
             |        CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)) AS BIGINT) cents
             |      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |      GROUP BY 1, 2),
             |t AS (SELECT brand, CAST(SUM(cents) AS BIGINT) tot,
             |             CAST(COUNT(*) AS BIGINT) n_sup FROM r GROUP BY brand),
             |h AS (SELECT r.brand, CAST(SUM(CAST(
             |        (CAST(r.cents AS DOUBLE)/CAST(t.tot AS DOUBLE))
             |        *(CAST(r.cents AS DOUBLE)/CAST(t.tot AS DOUBLE)) AS DECIMAL(28,14))) AS DOUBLE) hhi
             |      FROM r JOIN t ON r.brand = t.brand GROUP BY r.brand)
             |SELECT t.brand, t.n_sup, t.tot tot_cents, ROUND(h.hhi, 6) hhi
             |FROM t JOIN h ON t.brand = h.brand ORDER BY t.brand""".stripMargin),
      (s, d) => {
        val r = Tables.lineitem(s, d)
          .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"), col("l_suppkey").as("sk"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .cast("long").as("cents"))
        val t = r.groupBy("brand")
          .agg(sum("cents").cast("long").as("tot"),
            count(lit(1)).cast("long").as("n_sup"))
        val h = r.join(broadcast(t.select(col("brand"), col("tot"))), "brand")
          .select(col("brand"),
            ((col("cents").cast("double") / col("tot").cast("double"))
              * (col("cents").cast("double") / col("tot").cast("double")))
              .cast("decimal(28,14)").as("term"))
          .groupBy("brand").agg(sum("term").cast("double").as("hhi"))
        t.join(h, "brand")
          .select(col("brand"), col("n_sup"), col("tot").as("tot_cents"),
            round(col("hhi"), 6).as("hhi"))
          .orderBy("brand")
      })
  )
}
