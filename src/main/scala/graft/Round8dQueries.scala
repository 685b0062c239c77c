package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Queries.Q
import graft.sources.Tables

/** Round-8 fourth batch: operational analytics — bounded-depth
  * multi-source harmonic centrality, dyadic-weight EWMA smoothing,
  * hour-of-week seasonality, grid-density core cells (the DBSCAN
  * pre-pass), a mergeable power-of-two histogram with its median read,
  * and a join-key skew report (the diagnostic behind every salting
  * decision in operators/Skew.scala). Exact-integer discipline
  * throughout: harmonic weights 6/d are integers for d <= 3, EWMA
  * weights are powers of two, histogram buckets come from bit length —
  * no log(), no float accumulation, at most one IEEE division per
  * output value. */
object Round8dQueries {

  def all: Seq[Q] = Seq(

    Q("q257_harmonic_centrality",
      // Bounded-depth (3-hop) harmonic centrality from the first nine
      // suppliers over the undirected fulfillment graph: harm6(s) =
      // sum over reachable v of 6/dist(s,v) — integer 6/3/2 weights, so
      // the score is exact. The multi-SOURCE generalization of q166's
      // single-source BFS: ONE frontier relation keyed by (seed, node)
      // carries all searches together — k seeds cost one extra join
      // column, not k passes (the way landmark-distance sketches run at
      // scale). Each round is an equi-join + distinct + anti-join on
      // scalar keys; frontiers localCheckpoint to keep lineage flat.
      Some("""WITH e0 AS (SELECT CAST(l_suppkey AS BIGINT) a,
             |                   CAST(1000000 + o_custkey AS BIGINT) b
             |            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |            GROUP BY 1, 2),
             |e AS (SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0),
             |l0 AS (SELECT CAST(s_suppkey AS BIGINT) seed, CAST(s_suppkey AS BIGINT) node
             |       FROM supplier WHERE s_suppkey <= 8),
             |l1 AS (SELECT DISTINCT l0.seed, e.b node FROM e JOIN l0 ON e.a = l0.node
             |       WHERE NOT EXISTS (SELECT 1 FROM l0 x WHERE x.seed = l0.seed AND x.node = e.b)),
             |l2 AS (SELECT DISTINCT l1.seed, e.b node FROM e JOIN l1 ON e.a = l1.node
             |       WHERE NOT EXISTS (SELECT 1 FROM l0 x WHERE x.seed = l1.seed AND x.node = e.b)
             |         AND NOT EXISTS (SELECT 1 FROM l1 x WHERE x.seed = l1.seed AND x.node = e.b)),
             |l3 AS (SELECT DISTINCT l2.seed, e.b node FROM e JOIN l2 ON e.a = l2.node
             |       WHERE NOT EXISTS (SELECT 1 FROM l0 x WHERE x.seed = l2.seed AND x.node = e.b)
             |         AND NOT EXISTS (SELECT 1 FROM l1 x WHERE x.seed = l2.seed AND x.node = e.b)
             |         AND NOT EXISTS (SELECT 1 FROM l2 x WHERE x.seed = l2.seed AND x.node = e.b))
             |SELECT sd.seed,
             |  CAST(COALESCE(c1.n, 0) AS BIGINT) n1, CAST(COALESCE(c2.n, 0) AS BIGINT) n2,
             |  CAST(COALESCE(c3.n, 0) AS BIGINT) n3,
             |  CAST(6*COALESCE(c1.n, 0) + 3*COALESCE(c2.n, 0) + 2*COALESCE(c3.n, 0) AS BIGINT) harm6
             |FROM (SELECT DISTINCT seed FROM l0) sd
             |LEFT JOIN (SELECT seed s1, COUNT(*) n FROM l1 GROUP BY 1) c1 ON c1.s1 = sd.seed
             |LEFT JOIN (SELECT seed s2, COUNT(*) n FROM l2 GROUP BY 1) c2 ON c2.s2 = sd.seed
             |LEFT JOIN (SELECT seed s3, COUNT(*) n FROM l3 GROUP BY 1) c3 ON c3.s3 = sd.seed
             |ORDER BY seed""".stripMargin),
      (s, d) => {
        // shared a-partitioned doubled edges: each expansion shuffles only
        // the frontier (see AnalyticsQueries.fulfillmentUndirected)
        val e = AnalyticsQueries.fulfillmentUndirected(s, d)
        val seeds = Tables.supplier(s, d).filter(col("s_suppkey") <= 8)
          .select(col("s_suppkey").cast("long").as("seed"),
            col("s_suppkey").cast("long").as("node"))
        var frontier = seeds
        var visited = seeds
        val levels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        for (k <- 1 to 3) {
          frontier = e.join(frontier, e("a") === frontier("node"))
            .select(col("seed"), col("b").as("node")).distinct()
            .join(visited, Seq("seed", "node"), "left_anti")
            .localCheckpoint(true)
          visited = visited.unionByName(frontier)
          levels += frontier.groupBy("seed").agg(count(lit(1)).as(s"raw$k"))
        }
        val base = seeds.select("seed").distinct()
        val joined = levels.zipWithIndex.foldLeft(base) { case (acc, (lv, i)) =>
          acc.join(lv, Seq("seed"), "left")
            .withColumn(s"n${i + 1}", coalesce(col(s"raw${i + 1}"), lit(0L)))
            .drop(s"raw${i + 1}")
        }
        joined.select(col("seed"), col("n1"), col("n2"), col("n3"),
            (col("n1") * 6 + col("n2") * 3 + col("n3") * 2).as("harm6"))
          .orderBy("seed")
      }),

    Q("q258_user_ewma",
      // Per-user EWMA of transaction value over the 20 most recent
      // events with half-life-per-event decay: weight 2^(20-rank) —
      // POWERS OF TWO, so numerator and denominator are exact BIGINTs
      // and the smoothed value is ONE division at the edge (the
      // float-free twin of the classic ewma = a*x + (1-a)*ewma
      // recurrence, which no engine pair replays bit-identically).
      // Rank windows partition by user; the rank <= 20 cut bounds
      // per-user state exactly like a streaming implementation would.
      Some("""WITH v AS (SELECT user_id, CAST(ROUND(value*100) AS BIGINT) c,
             |            ROW_NUMBER() OVER (PARTITION BY user_id
             |                               ORDER BY ts DESC, event_id DESC) rn
             |           FROM events),
             |r AS (SELECT user_id, c, rn FROM v WHERE rn <= 20),
             |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) n_recent,
             |        CAST(SUM(c * (CAST(1 AS BIGINT) << (20 - rn))) AS BIGINT) num,
             |        CAST(SUM(CAST(1 AS BIGINT) << (20 - rn)) AS BIGINT) den
             |      FROM r GROUP BY user_id)
             |SELECT user_id, n_recent, num, den,
             |       ROUND(CAST(num AS DOUBLE)/CAST(den AS DOUBLE)/100, 4) ewma_value
             |FROM a ORDER BY user_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        val r = Tables.events(s, d)
          .select(col("user_id"), round(col("value") * 100).cast("long").as("c"),
            row_number().over(w).as("rn"))
          .filter(col("rn") <= 20)
        r.groupBy("user_id")
          .agg(count(lit(1)).cast("long").as("n_recent"),
            sum(col("c") * expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - rn AS INT))"))
              .cast("long").as("num"),
            sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(20 - rn AS INT))"))
              .cast("long").as("den"))
          .select(col("user_id"), col("n_recent"), col("num"), col("den"),
            round(col("num").cast("double") / col("den").cast("double") / 100, 4)
              .as("ewma_value"))
          .orderBy("user_id")
      }),

    Q("q259_hour_of_week",
      // Hour-of-week seasonality profile: per (ISO day-of-week, hour)
      // event count, exact cents total, integer mean, and the slot's
      // share of total spend in parts-per-million — the load-shaping
      // table behind trigger sizing and anomaly baselines. One hash agg
      // over a 168-slot domain; the grand total broadcasts as one row.
      // Spark's weekday() (0 = Monday) + 1 aligns with DuckDB ISODOW.
      Some("""WITH v AS (SELECT CAST(EXTRACT(ISODOW FROM ts) AS BIGINT) dow,
             |                  CAST(EXTRACT(HOUR FROM ts) AS BIGINT) hr,
             |                  CAST(ROUND(value*100) AS BIGINT) c FROM events),
             |a AS (SELECT dow, hr, CAST(COUNT(*) AS BIGINT) n,
             |             CAST(SUM(c) AS BIGINT) cents FROM v GROUP BY 1, 2),
             |t AS (SELECT CAST(SUM(c) AS BIGINT) tot FROM v)
             |SELECT dow, hr, n, cents,
             |       cents//n avg_cents,
             |       cents*1000000//t.tot share_e6
             |FROM a CROSS JOIN t ORDER BY dow, hr""".stripMargin),
      (s, d) => {
        val v = Tables.events(s, d).select(
          (expr("weekday(ts)") + 1).cast("long").as("dow"),
          hour(col("ts")).cast("long").as("hr"),
          round(col("value") * 100).cast("long").as("c"))
        val a = v.groupBy("dow", "hr")
          .agg(count(lit(1)).cast("long").as("n"), sum("c").cast("long").as("cents"))
        val t = v.agg(sum("c").cast("long").as("tot"))
        a.crossJoin(broadcast(t))
          .select(col("dow"), col("hr"), col("n"), col("cents"),
            expr("cents div n").as("avg_cents"),
            expr("cents * 1000000 div tot").as("share_e6"))
          .orderBy("dow", "hr")
      }),

    Q("q260_grid_density_cores",
      // DBSCAN's core-cell pre-pass on the embedding space: project on
      // the first two dimensions, quantize to a 0.25-wide grid (cell =
      // floor(x*4) — multiplying by a POWER OF TWO is exact in float32
      // and float64 alike, so both engines land every point in the same
      // cell), and mark cells meeting minPts = 5. At 100 TB this is the
      // shape that makes density clustering tractable: a map-side cell
      // key + one hash agg, with the expensive point-to-point phase
      // confined to core cells and their neighbors.
      Some("""WITH pts AS (SELECT vec_id, CAST(FLOOR(embedding[1]*4) AS BIGINT) cx,
             |                    CAST(FLOOR(embedding[2]*4) AS BIGINT) cy FROM embeddings),
             |cells AS (SELECT cx, cy, CAST(COUNT(*) AS BIGINT) n_pts FROM pts GROUP BY 1, 2)
             |SELECT cx, cy, n_pts,
             |       CAST(CASE WHEN n_pts >= 5 THEN 1 ELSE 0 END AS BIGINT) is_core
             |FROM cells ORDER BY cx, cy""".stripMargin),
      (s, d) => Tables.embeddings(s, d)
        .select(floor(element_at(col("embedding"), 1) * 4).cast("long").as("cx"),
          floor(element_at(col("embedding"), 2) * 4).cast("long").as("cy"))
        .groupBy("cx", "cy").agg(count(lit(1)).cast("long").as("n_pts"))
        .select(col("cx"), col("cy"), col("n_pts"),
          when(col("n_pts") >= 5, 1L).otherwise(0L).cast("long").as("is_core"))
        .orderBy("cx", "cy")),

    Q("q261_log2_histogram",
      // Mergeable power-of-two histogram per event type and its median
      // read-out: bucket = bit length of the cents value (no log() —
      // LENGTH(BIN(x)) is pure integer and engine-portable), giving a
      // bounded <= 64-bucket sketch whose per-partition partials merge
      // by addition — the quantile structure that rides a 100 TB
      // shuffle as 64 longs. The median lower bound 2^(b-1) comes from
      // the 2*cum >= tot walk over the bucket-bounded relation.
      Some("""WITH v AS (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) c
             |           FROM events WHERE value > 0),
             |b AS (SELECT event_type, CAST(LENGTH(BIN(c)) AS BIGINT) bucket FROM v),
             |h AS (SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) n
             |      FROM b GROUP BY 1, 2),
             |w AS (SELECT event_type, bucket, n,
             |        SUM(n) OVER (PARTITION BY event_type ORDER BY bucket
             |                     ROWS UNBOUNDED PRECEDING) cum,
             |        SUM(n) OVER (PARTITION BY event_type) tot FROM h)
             |SELECT event_type, CAST(COUNT(*) AS BIGINT) n_buckets,
             |       CAST(MAX(tot) AS BIGINT) n_values,
             |       MIN(CASE WHEN 2*cum >= tot THEN bucket END) med_bucket,
             |       CAST(1 AS BIGINT) << CAST(MIN(CASE WHEN 2*cum >= tot THEN bucket END) - 1 AS INT) med_lo
             |FROM w GROUP BY event_type ORDER BY event_type""".stripMargin),
      (s, d) => {
        val h = Tables.events(s, d).filter(col("value") > 0)
          .select(col("event_type"),
            length(bin(round(col("value") * 100).cast("long"))).cast("long").as("bucket"))
          .groupBy("event_type", "bucket").agg(count(lit(1)).cast("long").as("n"))
        val wc = Window.partitionBy("event_type").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wt = Window.partitionBy("event_type")
        h.select(col("event_type"), col("bucket"), col("n"),
            sum("n").over(wc).as("cum"), sum("n").over(wt).as("tot"))
          .groupBy("event_type")
          .agg(count(lit(1)).cast("long").as("n_buckets"),
            max("tot").cast("long").as("n_values"),
            min(when(col("cum") * 2 >= col("tot"), col("bucket"))).as("med_bucket"))
          .select(col("event_type"), col("n_buckets"), col("n_values"),
            col("med_bucket"),
            expr("shiftleft(CAST(1 AS BIGINT), CAST(med_bucket - 1 AS INT))").as("med_lo"))
          .orderBy("event_type")
      }),

    Q("q262_key_skew_report",
      // Join-key skew diagnostics for the three fact-side keys the
      // salting operators guard: per key column, row/key counts, the
      // hottest key's row count, skew factor (max/mean, ppm) and the
      // top-1 share — the report that DECIDES whether operators/Skew's
      // salted path is worth its extra exchange. Each branch is one
      // hash agg + a 1-row re-agg; integers end to end.
      Some("""WITH c1 AS (SELECT l_partkey k, COUNT(*) n FROM lineitem GROUP BY 1),
             |c2 AS (SELECT l_suppkey k, COUNT(*) n FROM lineitem GROUP BY 1),
             |c3 AS (SELECT o_custkey k, COUNT(*) n FROM orders GROUP BY 1),
             |u AS (
             |  SELECT 'lineitem.l_partkey' key_col, CAST(SUM(n) AS BIGINT) n_rows,
             |         CAST(COUNT(*) AS BIGINT) n_keys, CAST(MAX(n) AS BIGINT) max_key_rows FROM c1
             |  UNION ALL SELECT 'lineitem.l_suppkey', CAST(SUM(n) AS BIGINT),
             |         CAST(COUNT(*) AS BIGINT), CAST(MAX(n) AS BIGINT) FROM c2
             |  UNION ALL SELECT 'orders.o_custkey', CAST(SUM(n) AS BIGINT),
             |         CAST(COUNT(*) AS BIGINT), CAST(MAX(n) AS BIGINT) FROM c3)
             |SELECT key_col, n_rows, n_keys, max_key_rows,
             |       max_key_rows*n_keys*1000000//n_rows skew_e6,
             |       max_key_rows*1000000//n_rows top1_share_e6
             |FROM u ORDER BY key_col""".stripMargin),
      (s, d) => {
        def branch(df: DataFrame, keyCol: String, label: String): DataFrame =
          df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("n"))
            .agg(sum("n").cast("long").as("n_rows"),
              count(lit(1)).cast("long").as("n_keys"),
              max("n").cast("long").as("max_key_rows"))
            .select(lit(label).as("key_col"), col("n_rows"), col("n_keys"),
              col("max_key_rows"))
        branch(Tables.lineitem(s, d), "l_partkey", "lineitem.l_partkey")
          .unionByName(branch(Tables.lineitem(s, d), "l_suppkey", "lineitem.l_suppkey"))
          .unionByName(branch(Tables.orders(s, d), "o_custkey", "orders.o_custkey"))
          .select(col("key_col"), col("n_rows"), col("n_keys"), col("max_key_rows"),
            expr("max_key_rows * n_keys * 1000000 div n_rows").as("skew_e6"),
            expr("max_key_rows * 1000000 div n_rows").as("top1_share_e6"))
          .orderBy("key_col")
      })
  )
}
