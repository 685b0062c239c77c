package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Queries.Q
import graft.sources.Tables

/** Round-3 inventory extension (q81–q106): the remaining TPC-H query
  * *shapes* expressible over the driver schema (Q2's correlated min, Q4's
  * EXISTS count, Q11's share-of-total HAVING, Q13's two-level distribution,
  * Q14's conditional ratio, Q16's NOT-IN distinct count, Q17's
  * avg-quantity correlated filter, Q18's having-then-rejoin, Q22's
  * rich-inactive anti join) plus map/struct/string-format/regexp/date-part
  * function coverage, and the skew-salting join/agg rewrites proven
  * equal to their plain forms under the oracle (q95/q96). All under the
  * SURVEY §2.2 determinism rules; every
  * fractional comparison is restated multiplicatively over exact decimals
  * (e.g. `5·qty·n < Σqty` for `qty < 0.2·avg`) so no engine ever compares
  * against a rounded quotient.
  */
object MoreQueries {

  import Queries.{dsum, dsumD, r4}

  def all: Seq[Q] = Seq(

    Q("q81_min_price_supplier",
      // TPC-H Q2 shape: suppliers achieving the per-part minimum price.
      // The correlated MIN is a window over the part-filtered join — the
      // filter lands BEFORE the window pass, so the 100 TB plan windows
      // only surviving parts (min-per-partkey is join-invariant: the dim
      // join drops whole partkeys, never individual lineitems).
      Some("""WITH pmin AS (SELECT l_partkey, MIN(l_extendedprice) AS minp
             |              FROM lineitem GROUP BY l_partkey)
             |SELECT p_partkey, s_suppkey, s_name, l_orderkey, l_linenumber,
             |       ROUND(l_extendedprice, 4) AS price
             |FROM part
             |JOIN lineitem ON l_partkey = p_partkey
             |JOIN supplier ON s_suppkey = l_suppkey
             |JOIN pmin ON pmin.l_partkey = p_partkey AND l_extendedprice = pmin.minp
             |WHERE p_size <= 5
             |ORDER BY p_partkey, s_suppkey, l_orderkey, l_linenumber""".stripMargin),
      (s, d) => {
        val parts = Tables.part(s, d).filter(col("p_size") <= 5).select("p_partkey")
        val w = Window.partitionBy("l_partkey")
        Tables.lineitem(s, d)
          .join(parts, col("l_partkey") === col("p_partkey"))
          .withColumn("minp", min(col("l_extendedprice")).over(w))
          .filter(col("l_extendedprice") === col("minp"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
            col("l_orderkey"), col("l_linenumber"),
            r4(col("l_extendedprice")).as("price"))
          .orderBy("p_partkey", "s_suppkey", "l_orderkey", "l_linenumber")
      }),

    Q("q82_late_ship_priority",
      // TPC-H Q4 shape: EXISTS decorrelates to a left-semi join; the fact
      // side never duplicates orders however many lineitems match.
      Some("""SELECT o_orderpriority, COUNT(*) AS n
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      (s, d) => {
        val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
        Tables.orders(s, d)
          .join(li, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      }),

    Q("q83_brand_value_share",
      // TPC-H Q11 shape: groups above a fraction of the global total. The
      // share test is multiplicative over exact decimals (50·Σbrand > Σall
      // ⇔ share > 2%) — no quotient, no float boundary.
      Some("""WITH tot AS (SELECT SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS t
             |             FROM part)
             |SELECT p_brand,
             |       ROUND(CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS brand_value
             |FROM part, tot
             |GROUP BY p_brand, t
             |HAVING 50 * SUM(CAST(p_retailprice AS DECIMAL(18,4))) > t
             |ORDER BY p_brand""".stripMargin),
      (s, d) => {
        val p = Tables.part(s, d)
        val tot = p.agg(dsum(col("p_retailprice")).as("t"))
        p.groupBy("p_brand").agg(dsum(col("p_retailprice")).as("bsum"))
          .crossJoin(broadcast(tot))
          .filter(col("bsum") * 50 > col("t"))
          .select(col("p_brand"), r4(col("bsum").cast("double")).as("brand_value"))
          .orderBy("p_brand")
      }),

    Q("q84_custdist",
      // TPC-H Q13 shape: two-level aggregation incl. zero-order customers
      // (the left join keeps them; COUNT(o_orderkey) ignores the nulls).
      Some("""WITH c AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
             |           FROM customer LEFT JOIN orders ON o_custkey = c_custkey
             |           GROUP BY c_custkey)
             |SELECT c_count, COUNT(*) AS custdist
             |FROM c GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin),
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),

    Q("q85_promo_share",
      // TPC-H Q14 shape: monthly promo revenue share. Both operands of the
      // single final division are exact decimal sums surfaced as double.
      Some("""SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
             |       CAST(month(l_shipdate) AS BIGINT) AS mo,
             |       ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
             |                THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
             |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             |             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE),
             |             4) AS promo_share
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin),
      (s, d) => {
        val rev = (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")
        val zero = lit(0).cast("decimal(18,4)")
        Tables.lineitem(s, d)
          .join(Tables.part(s, d).select("p_partkey", "p_type"),
            col("l_partkey") === col("p_partkey"))
          .groupBy(year(col("l_shipdate")).cast("long").as("yr"),
            month(col("l_shipdate")).cast("long").as("mo"))
          .agg(r4(lit(100.0) *
            sum(when(col("p_type") === "PROMO", rev).otherwise(zero)).cast("double") /
            sum(rev).cast("double")).as("promo_share"))
          .orderBy("yr", "mo")
      }),

    Q("q86_supplier_cnt",
      // TPC-H Q16 shape: NOT IN over a never-null key == left-anti join.
      Some("""SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
             |FROM part JOIN lineitem ON p_partkey = l_partkey
             |WHERE p_size IN (1, 5, 9, 13)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY p_brand, p_type, p_size
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
      (s, d) => {
        val badSupp = Tables.supplier(s, d)
          .filter(col("s_acctbal") < 0).select("s_suppkey")
        Tables.lineitem(s, d)
          .join(Tables.part(s, d)
              .filter(col("p_size").isin(1, 5, 9, 13))
              .select("p_partkey", "p_brand", "p_type", "p_size"),
            col("l_partkey") === col("p_partkey"))
          .join(badSupp, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      }),

    Q("q87_small_qty_revenue",
      // TPC-H Q17 shape: `qty < 0.2·avg(qty per part)` restated as
      // `5·qty·n < Σqty` over exact decimals — the correlated-average
      // filter without a quotient.
      Some("""WITH pa AS (SELECT l_partkey,
             |                   SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq,
             |                   COUNT(*) AS n
             |            FROM lineitem GROUP BY l_partkey)
             |SELECT p_brand,
             |       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
             |       COUNT(*) AS n_items
             |FROM lineitem
             |JOIN pa USING (l_partkey)
             |JOIN part ON p_partkey = l_partkey
             |WHERE CAST(l_quantity AS DECIMAL(18,4)) * 5 * n < sq
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val pa = li.groupBy(col("l_partkey").as("pa_partkey"))
          .agg(dsum(col("l_quantity")).as("sq"), count(lit(1)).as("n"))
        li.join(pa, col("l_partkey") === col("pa_partkey"))
          .join(Tables.part(s, d).select("p_partkey", "p_brand"),
            col("p_partkey") === col("l_partkey"))
          .filter(col("l_quantity").cast("decimal(18,4)") * 5 * col("n") < col("sq"))
          .groupBy("p_brand")
          .agg(r4(dsumD(col("l_extendedprice"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("p_brand")
      }),

    Q("q88_big_orders",
      // TPC-H Q18 shape: grouped HAVING feeds a semi filter, then the
      // surviving orders re-join and re-aggregate.
      Some("""WITH big AS (SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
             |             HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300)
             |SELECT c_name, c_custkey, o_orderkey,
             |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
             |       ROUND(o_totalprice, 4) AS total_price,
             |       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |JOIN big ON big.l_orderkey = o_orderkey
             |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
             |ORDER BY o_orderkey""".stripMargin),
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val big = li.groupBy("l_orderkey")
          .agg(dsum(col("l_quantity")).as("sq"))
          .filter(col("sq") > lit(300).cast("decimal(18,4)"))
          .select(col("l_orderkey").as("big_orderkey"))
        li.join(big, col("l_orderkey") === col("big_orderkey"))
          .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(Tables.customer(s, d).select("c_custkey", "c_name"),
            col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"))
          .agg(r4(dsumD(col("l_quantity"))).as("sum_qty"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
            r4(col("o_totalprice")).as("total_price"), col("sum_qty"))
          .orderBy("o_orderkey")
      }),

    Q("q89_rich_inactive",
      // TPC-H Q22 shape: above-average balance (scalar subquery) and no
      // LARGE order (anti join with a residual predicate pushed into the
      // anti side), summarized per segment. Every customer in the driver
      // data has at least one order, so the plain no-orders form would be
      // vacuously empty — the price floor keeps the anti join load-bearing.
      Some("""WITH ab AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
             |                   / COUNT(*) AS a
             |            FROM customer WHERE c_acctbal > 0)
             |SELECT c_mktsegment, COUNT(*) AS n_custs,
             |       ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_bal
             |FROM customer, ab
             |WHERE c_acctbal > a
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      (s, d) => {
        val cust = Tables.customer(s, d)
        val avgBal = cust.filter(col("c_acctbal") > 0)
          .agg((dsumD(col("c_acctbal")) / count(lit(1))).as("a"))
        val bigOrders = Tables.orders(s, d)
          .filter(col("o_totalprice") > 450000).select("o_custkey")
        cust.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("a"))
          .join(bigOrders, col("o_custkey") === col("c_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_custs"), r4(dsumD(col("c_acctbal"))).as("total_bal"))
          .orderBy("c_mktsegment")
      }),

    Q("q90_map_funcs",
      // MapType surface: build (map_from_arrays/create_map), merge
      // (map_concat), rewrite values (transform_values), drop entries
      // (map_filter), read (element_at/map_keys). The oracle states the
      // equivalent scalar results directly — the map algebra is the thing
      // under test on the Spark side.
      Some("""SELECT p_partkey, UPPER(p_brand) AS brand_u, UPPER(p_type) AS type_u,
             |       CAST(3 AS BIGINT) AS n_keys, 'brand,type' AS kept_keys
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, d) => {
        val m0 = map_from_arrays(array(lit("brand"), lit("type")),
          array(col("p_brand"), col("p_type")))
        val m = map_concat(m0, map(lit("size"), col("p_size").cast("string")))
        val mu = transform_values(m, (_, v) => upper(v))
        val kept = map_filter(mu, (k, _) => k =!= "size")
        Tables.part(s, d)
          .select(col("p_partkey"),
            element_at(mu, "brand").as("brand_u"),
            element_at(mu, "type").as("type_u"),
            size(m).cast("long").as("n_keys"),
            array_join(array_sort(map_keys(kept)), ",").as("kept_keys"))
          .orderBy("p_partkey")
      }),

    Q("q91_struct_minmax",
      // Struct ordering as a deterministic arg-min/arg-max: min/max over
      // struct(price, key) — the (price, key) pair is unique, so ties are
      // impossible by construction (the safe form of min_by/max_by).
      Some("""WITH w AS (SELECT o_custkey, o_totalprice, o_orderkey,
             |  ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                     ORDER BY o_totalprice, o_orderkey) AS rn_min,
             |  ROW_NUMBER() OVER (PARTITION BY o_custkey
             |                     ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_max
             |  FROM orders)
             |SELECT o_custkey,
             |       MAX(CASE WHEN rn_min = 1 THEN o_orderkey END) AS cheapest_key,
             |       ROUND(MAX(CASE WHEN rn_min = 1 THEN o_totalprice END), 4) AS cheapest_price,
             |       MAX(CASE WHEN rn_max = 1 THEN o_orderkey END) AS priciest_key,
             |       ROUND(MAX(CASE WHEN rn_max = 1 THEN o_totalprice END), 4) AS priciest_price
             |FROM w GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),
      (s, d) => Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(min(struct(col("o_totalprice"), col("o_orderkey"))).as("mn"),
          max(struct(col("o_totalprice"), col("o_orderkey"))).as("mx"))
        .select(col("o_custkey"),
          col("mn.o_orderkey").as("cheapest_key"),
          r4(col("mn.o_totalprice")).as("cheapest_price"),
          col("mx.o_orderkey").as("priciest_key"),
          r4(col("mx.o_totalprice")).as("priciest_price"))
        .orderBy("o_custkey")),

    Q("q92_string_format",
      // C-style formatting (format_string ≡ printf), char translation,
      // repetition — the string surface q58 left uncovered.
      Some("""SELECT p_partkey,
             |       printf('%s#%05d', p_brand, p_partkey) AS tag,
             |       translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
             |       concat_ws('|', p_brand, p_type, CAST(p_size AS VARCHAR)) AS joined,
             |       repeat('*', CAST(p_size % 5 AS INT) + 1) AS stars
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          format_string("%s#%05d", col("p_brand"), col("p_partkey")).as("tag"),
          translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
          concat_ws("|", col("p_brand"), col("p_type"), col("p_size").cast("string")).as("joined"),
          repeat(lit("*"), (col("p_size") % 5 + 1).cast("int")).as("stars"))
        .orderBy("p_partkey")),

    Q("q93_regexp_funcs",
      // regexp_count / boolean match / group extract / class replace —
      // all in the RE2-compatible subset both engines share.
      Some("""SELECT p_partkey,
             |       CAST(LEN(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
             |       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
             |       regexp_matches(p_name, 'ro') AS has_ro,
             |       regexp_replace(p_type, '[AEIOU]', '_', 'g') AS masked
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          regexp_count(col("p_name"), lit("[aeiou]")).cast("long").as("n_vowels"),
          regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
          col("p_name").rlike("ro").as("has_ro"),
          regexp_replace(col("p_type"), "[AEIOU]", "_").as("masked"))
        .orderBy("p_partkey")),

    Q("q94_date_parts",
      // make_date reconstruction + day-of-year/ISO-week extraction,
      // aggregated per month (q60 covers arithmetic; this covers
      // construction and the remaining extract surface).
      Some("""SELECT CAST(year(l_shipdate) AS BIGINT) AS yr,
             |       CAST(month(l_shipdate) AS BIGINT) AS mo,
             |       strftime(make_date(CAST(year(l_shipdate) AS INT),
             |                          CAST(month(l_shipdate) AS INT), 1),
             |                '%Y-%m-%d') AS month_start,
             |       COUNT(*) AS n,
             |       CAST(MIN(dayofyear(l_shipdate)) AS BIGINT) AS first_doy,
             |       CAST(MAX(weekofyear(l_shipdate)) AS BIGINT) AS max_wk
             |FROM lineitem GROUP BY 1, 2, 3 ORDER BY yr, mo""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .groupBy(year(col("l_shipdate")).cast("long").as("yr"),
          month(col("l_shipdate")).cast("long").as("mo"),
          date_format(make_date(year(col("l_shipdate")), month(col("l_shipdate")), lit(1)),
            "yyyy-MM-dd").as("month_start"))
        .agg(count(lit(1)).as("n"),
          min(dayofyear(col("l_shipdate"))).cast("long").as("first_doy"),
          max(weekofyear(col("l_shipdate"))).cast("long").as("max_wk"))
        .orderBy("yr", "mo")),

    Q("q95_salted_join",
      // The skew-salting join rewrite under the oracle: Skew.saltedJoin
      // spreads each fact key over k salted copies of the dim row, and the
      // result must be EXACTLY the plain equi-join — the oracle states the
      // plain join, so any salting bug (lost rows, duplicate dim copies)
      // hash-fails. SkewSpec covers the plan shape; this covers semantics.
      Some("""SELECT p_brand,
             |       ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue,
             |       COUNT(*) AS n_items
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin),
      (s, d) => graft.operators.Skew.saltedJoin(
          Tables.lineitem(s, d),
          Tables.part(s, d).select("p_partkey", "p_brand"),
          factKey = "l_partkey", dimKey = "p_partkey",
          factUnique = "l_orderkey", k = 8)
        .groupBy("p_brand")
        .agg(r4(dsumD(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")),

    Q("q96_salted_agg",
      // Two-phase salted aggregation == the one-shuffle groupBy, exactly:
      // partial (key, salt) sums are decimal-exact, so re-aggregation on
      // key is order-independent and hash-stable.
      Some("""SELECT user_id, COUNT(*) AS cnt,
             |       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_r
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin),
      (s, d) => graft.operators.Skew.saltedCountSum(
          Tables.events(s, d), key = "user_id", valueCol = "value",
          uniqueCol = "event_id", k = 8)
        .select(col("user_id"), col("cnt"), r4(col("sum_value")).as("sum_r"))
        .orderBy("user_id"))
    ,

    Q("q97_heavy_hitters_exact",
      // The Misra–Gries summary in its EXACT regime: capacity (512) far
      // above the corpus vocabulary (31), so no buffer ever decrements and
      // the sketch must reproduce the exact groupBy counts with err = 0 —
      // the one regime where a frequency sketch is hash-checkable. The
      // sub-capacity approximate regime is property-tested instead
      // (HeavyHittersSpec).
      Some("""SELECT t AS item, COUNT(*) AS cnt, CAST(0 AS BIGINT) AS err
             |FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents) u
             |WHERE t <> ''
             |GROUP BY t ORDER BY cnt DESC, item""".stripMargin),
      (s, d) => graft.operators.TextAnalysis
        .topTokensApprox(Tables.documents(s, d), "text", k = 512)
        .select(col("item"), col("count").as("cnt"), col("err"))
        .orderBy(col("cnt").desc, col("item"))),

    Q("q98_multimodal_frames",
      // Multimodal frame-sampling arithmetic under the oracle: every
      // synthetic blob is 17 md5 hex strings = 544 bytes -> 8 full
      // 64-byte frames, stride 4 keeps frames {0, 4}. The oracle derives
      // the same counts from the construction (generate_series), so the
      // slicing math (full-frame floor, stride selection, exact frame
      // length) is cross-checked; the decode stub itself is pinned by
      // MultimodalSpec.
      Some("""SELECT CAST(g AS BIGINT) AS media_id,
             |       CAST(2 AS BIGINT) AS n_frames,
             |       CAST(4 AS BIGINT) AS sum_frame_no,
             |       CAST(128 AS BIGINT) AS sum_bytes
             |FROM generate_series(0, 199) t(g) ORDER BY media_id""".stripMargin),
      (s, d) => {
        val media = graft.operators.Multimodal.syntheticMedia(s, 200)
        graft.operators.Multimodal.sampleFrames(media, frameSize = 64, stride = 4)
          .groupBy("media_id")
          .agg(count(lit(1)).as("n_frames"),
            sum(col("frame_no")).as("sum_frame_no"),
            sum(length(col("frame_bytes"))).as("sum_bytes"))
          .orderBy("media_id")
      }),

    Q("q99_cube",
      // CUBE completes the multi-dimensional agg family (q12 rollup, q51
      // grouping sets): all 4 grouping combinations in one pass, NULLs
      // disambiguated from real values by GROUPING().
      Some("""SELECT l_returnflag, l_linestatus,
             |       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
             |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
             |       COUNT(*) AS n,
             |       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin),
      (s, d) => {
        // DataFrame cube() + grouping() trips the same spurious
        // ambiguous-self-join analyzer error as rollup did in q12 on
        // Spark 4.1 — spark.sql is the reliable form for both.
        Tables.lineitem(s, d).createOrReplaceTempView("graft_li_q99")
        s.sql("""SELECT l_returnflag, l_linestatus,
                |       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
                |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
                |       COUNT(*) AS n,
                |       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 4) AS sum_qty
                |FROM graft_li_q99
                |GROUP BY CUBE (l_returnflag, l_linestatus)
                |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
      }),

    Q("q100_except_all",
      // Bag-semantics difference (q21 is the DISTINCT form, q66 the
      // INTERSECT ALL dual): each nation key survives max(0, countL -
      // countR) times.
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT ALL
             |SELECT s_nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin),
      (s, d) => Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .exceptAll(Tables.supplier(s, d).select(col("s_nationkey")))
        .orderBy("nationkey")),

    Q("q101_explode_outer",
      // Null-preserving explode (q33/q68 are the dropping forms): rows
      // whose match list is empty survive with a NULL element instead of
      // vanishing. DuckDB has no UNNEST-outer, so the oracle injects the
      // [NULL] sentinel explicitly — same rows, same semantics.
      Some("""SELECT p_partkey,
             |       UNNEST(CASE WHEN LEN(l) = 0 THEN [NULL] ELSE l END) AS m
             |FROM (SELECT p_partkey, regexp_extract_all(p_type, 'M[A-Z]+') AS l
             |      FROM part)
             |ORDER BY p_partkey, m""".stripMargin),
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"),
          explode_outer(regexp_extract_all(col("p_type"), lit("M[A-Z]+"), lit(0))).as("m"))
        .orderBy("p_partkey", "m")),

    Q("q102_bit_aggs",
      // Bitwise AGGREGATES (q59 covers scalar bit ops): AND/OR/XOR folds
      // are commutative+associative, so they are shuffle-order-stable and
      // hash-checkable, unlike float folds.
      Some("""SELECT l_returnflag,
             |       bit_and(l_orderkey) AS b_and,
             |       bit_or(l_orderkey) AS b_or,
             |       bit_xor(l_orderkey) AS b_xor,
             |       COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(bit_and(col("l_orderkey")).as("b_and"),
          bit_or(col("l_orderkey")).as("b_or"),
          bit_xor(col("l_orderkey")).as("b_xor"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    Q("q103_window_distinct",
      // Running DISTINCT count per key: Spark has no COUNT(DISTINCT) over
      // a window, so the engine form is size(collect_set() OVER w) — the
      // VALUE is order-insensitive (set semantics) even though collect_set
      // itself isn't, which is what makes it hash-checkable.
      Some("""SELECT user_id, event_id,
             |       CAST(COUNT(DISTINCT event_type) OVER (
             |         PARTITION BY user_id ORDER BY ts, event_id
             |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_distinct
             |FROM events ORDER BY user_id, event_id""".stripMargin),
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            size(collect_set(col("event_type")).over(w)).cast("long").as("run_distinct"))
          .orderBy("user_id", "event_id")
      }),

    Q("q104_try_funcs",
      // The try_* null-on-error family — how the engine keeps ANSI mode ON
      // (Spark 4 default; 0/0 and bad casts are runtime errors) while junk
      // data degrades to NULL instead of killing a 100 TB job. DuckDB
      // states the same semantics natively: NULLIF-guarded division,
      // TRY_CAST, out-of-range list index -> NULL.
      Some("""SELECT l_orderkey, l_linenumber, l_quantity,
             |       ROUND(l_orderkey / NULLIF(l_orderkey % 3, 0), 4) AS div3,
             |       TRY_CAST(l_returnflag AS INT) AS flag_n,
             |       TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INT) AS ln_n,
             |       ([l_orderkey, l_partkey])[CAST(l_linenumber AS INT)] AS pick
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, l_quantity, pick""".stripMargin),
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          r4(try_divide(col("l_orderkey"), col("l_orderkey") % 3)).as("div3"),
          try_to_number(col("l_returnflag"), lit("9")).cast("int").as("flag_n"),
          try_to_number(col("l_linenumber").cast("string"), lit("9")).cast("int").as("ln_n"),
          try_element_at(array(col("l_orderkey"), col("l_partkey")),
            col("l_linenumber").cast("int")).as("pick"))
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "pick")),

    Q("q106_hof_predicates",
      // Quantifier HOFs over arrays — exists / forall (DuckDB: list_filter
      // length tests) plus a filter+aggregate composition, on the token
      // arrays the text pipeline lives on.
      Some(s"""SELECT doc_id,
              |       LEN(LIST_FILTER(t, x -> x = 'the')) > 0 AS has_the,
              |       LEN(LIST_FILTER(t, x -> LEN(x) >= 2)) = LEN(t) AS all_ge2,
              |       CAST(LEN(LIST_FILTER(t, x -> LEN(x) >= 5)) AS BIGINT) AS n_long
              |FROM (SELECT doc_id, LIST_FILTER(STRING_SPLIT(text, ' '), t -> t <> '') AS t
              |      FROM documents) d
              |ORDER BY doc_id""".stripMargin),
      (s, d) => {
        val t = graft.operators.TextAnalysis.tokens(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            exists(t, x => x === "the").as("has_the"),
            forall(t, x => length(x) >= 2).as("all_ge2"),
            size(filter(t, x => length(x) >= 5)).cast("long").as("n_long"))
          .orderBy("doc_id")
      }),

    Q("q105_str_to_map",
      // Key:value string parsing into a MapType (str_to_map) and reading
      // it back out — the oracle restates the end-to-end result directly
      // (the map algebra is the Spark-side subject, as in q90).
      Some("""SELECT p_partkey, p_brand AS brand_v, CAST(p_size AS VARCHAR) AS size_v,
             |       CAST(2 AS BIGINT) AS n_entries
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, d) => {
        val m = str_to_map(
          concat(lit("brand:"), col("p_brand"), lit(",size:"), col("p_size").cast("string")),
          lit(","), lit(":"))
        Tables.part(s, d)
          .select(col("p_partkey"),
            element_at(m, "brand").as("brand_v"),
            element_at(m, "size").as("size_v"),
            size(m).cast("long").as("n_entries"))
          .orderBy("p_partkey")
      })
  )
}
