package graft

import org.apache.spark.sql.functions._

/** Round-8 fifteenth batch: ACF pair accounting, the ANOVA identity,
  * and lift-matrix consistency with the chi-square summary. */
class Round8oSpec extends SparkSpec {
  import spark.implicits._

  test("q298: pair count equals consecutive-day runs and acf1 is bounded") {
    val (nPairs, acf1) = Queries.queryMap("q298_acf_lag1")(spark, sf0001)
      .as[(Long, Double)].first()
    assert(acf1 >= -1.0 && acf1 <= 1.0)
    val days = graft.sources.Tables.orders(spark, sf0001)
      .select(col("o_orderdate").cast("date")).distinct()
      .as[java.sql.Date].collect().map(_.toLocalDate).sorted
    val expected = days.toSeq.sliding(2).count {
      case Seq(a, b) => a.plusDays(1) == b; case _ => false
    }
    assert(nPairs === expected.toLong)
  }

  test("q299: the ANOVA share is inside [0, 1e6] and grouping by slot is lossless") {
    val (n, ppm) = Queries.queryMap("q299_seasonality_strength")(spark, sf0001)
      .as[(Long, Double)].first()
    assert(ppm >= 0.0 && ppm <= 1000000.0,
      "between-group share of total variance must be a fraction")
    assert(n === graft.sources.Tables.events(spark, sf0001).count())
  }

  test("q300: lift cells are consistent with the q252 chi-square marginals") {
    val rows = Queries.queryMap("q300_contingency_lift")(spark, sf0001)
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = rows.map(_._3).sum
    rows.foreach { case (_, _, o, expMicro, lift) =>
      assert(o > 0 && expMicro > 0 && lift > 0)
    }
    // observed cells sum to the corpus; average lift is ~1e6 by
    // construction (sum over cells of o*lift-expectation balances)
    assert(total === graft.sources.Tables.documents(spark, sf0001).count())
    // expected micro-counts also sum to ~n * 1e6 over the OBSERVED cells
    // only when every cell is populated; bound it loosely instead
    val expSum = rows.map(_._4).sum
    assert(expSum <= total * 1000000L,
      "observed-cell expectations cannot exceed the full-grid total")
  }
}
