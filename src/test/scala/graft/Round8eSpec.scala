package graft

import org.apache.spark.sql.functions._

/** Round-8 fifth batch: blocking completeness for the edit-distance
  * join, violation accounting in the expectations operator, quantile
  * generalization, and drift-metric degenerate cases. */
class Round8eSpec extends SparkSpec {
  import spark.implicits._

  test("q263: p90 >= median and both match a driver-side nearest-rank sort") {
    val rows = Queries.queryMap("q263_gap_quantiles")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, med, p90) => assert(p90 >= med) }
    // recompute gaps for one type
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .as[(Long, Long, String, Long)].collect()
    val gaps = ev.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._4, e._2)).sliding(2).collect {
        case Array(a, b) => (b._3, (b._4 - a._4) / 1000000)
      }
    }.toSeq
    rows.foreach { case (t, nGaps, med, p90) =>
      val g = gaps.filter(_._1 == t).map(_._2).sorted
      assert(nGaps === g.length.toLong, s"$t gap count")
      assert(med === g(((g.length + 1) / 2) - 1), s"$t median")
      assert(p90 === g(((9 * g.length + 9) / 10) - 1), s"$t p90")
    }
  }

  test("q264: deletion-neighborhood blocking finds every distance<=1 pair") {
    val names = graft.sources.Tables.part(spark, sf0001)
      .select(col("p_name")).distinct().as[String].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expected = (for {
      a <- names; b <- names if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    val got = Queries.queryMap("q264_edit_distance_join")(spark, sf0001)
      .as[(String, String, Long)].collect().map(r => (r._1, r._2)).toSet
    assert(got === expected, "blocking must be lossless for distance <= 1")
  }

  test("Expectations: injected violations are counted, not just detected") {
    import graft.operators.Expectations
    val child = Seq((1L, "a"), (1L, "b"), (2L, null.asInstanceOf[String]),
      (9L, "d"), (9L, "e")).toDF("k", "v")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val rep = Expectations.report(Seq(
        Expectations.unique("child.k.unique", child, Seq("k")),
        Expectations.rowChecks(child, Seq("child.v.not_null" -> col("v").isNull)),
        Expectations.referential("child.k.ref_parent", child, "k", parent, "pk")))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rep("child.k.unique") === ((5L, 2L, 0L)))      // 1 and 9 duplicated
    assert(rep("child.v.not_null") === ((5L, 1L, 0L)))    // one null v
    assert(rep("child.k.ref_parent") === ((5L, 2L, 0L)))  // two rows with k=9
    // clean table passes
    val clean = Expectations.report(Seq(
        Expectations.unique("u", parent, Seq("pk"))))
      .as[(String, Long, Long, Long)].first()
    assert(clean._4 === 1L)
  }

  test("Expectations.referential: a child column colliding with the internal alias is rejected") {
    import graft.operators.Expectations
    // same-name FK (both "id") resolves via the _ex_pk alias...
    val child = Seq((1L, "x"), (7L, "y")).toDF("id", "v")
    val parent = Seq(1L, 2L).toDF("id")
    val r = Expectations.referential("c", child, "id", parent, "id")
      .as[(String, Long, Long)].first()
    assert(r === (("c", 2L, 1L)))
    // ...so a child frame already carrying _ex_pk would recreate the
    // ambiguity under the fixed name — refused loudly, not mis-resolved
    val bad = Seq((1L, 5L)).toDF("id", "_ex_pk")
    val e = intercept[IllegalArgumentException] {
      Expectations.referential("c", bad, "id", parent, "id")
    }
    assert(e.getMessage.contains("_ex_pk"))
  }

  test("q266: per-prefix results match a driver-side top-3") {
    val got = Queries.queryMap("q266_prefix_topk")(spark, sf0001)
      .as[(String, String, Long)].collect()
    val cnt = graft.sources.Tables.lineitem(spark, sf0001)
      .join(graft.sources.Tables.part(spark, sf0001),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_name")).agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect()
    val expected = cnt.toSeq.flatMap { case (n, c) =>
      Seq(n.take(1), n.take(2), n.take(3)).map(p => (p, n, c))
    }.groupBy(_._1).values.flatMap(_.sortBy(x => (-x._3, x._2)).take(3)).toSet
    assert(got.toSet === expected)
  }

  test("q267: weeks anchor on Monday and ratios are exact floor ppm") {
    val rows = Queries.queryMap("q267_wow_rate_shift")(spark, sf0001)
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, wk, n, pn, ratio) =>
      assert(java.time.LocalDate.parse(wk).getDayOfWeek
        === java.time.DayOfWeek.MONDAY)
      assert(ratio === n * 1000000L / pn)
    }
  }

  test("q268: TVD is bounded and zero for identical distributions") {
    val rows = Queries.queryMap("q268_tvd_drift")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    rows.foreach { case (_, n1, n2, tvd) =>
      assert(n1 > 0 && n2 > 0)
      assert(tvd >= 0L && tvd <= 1000000L)
    }
    // identical halves -> every |c1*n2 - c2*n1| = 0
    val cells = Seq((10L, 10L), (5L, 5L), (3L, 3L))
    val n1 = cells.map(_._1).sum; val n2 = cells.map(_._2).sum
    val s = cells.map { case (c1, c2) => math.abs(c1 * n2 - c2 * n1) }.sum
    assert(s * 500000 / (n1 * n2) === 0L)
  }
}
