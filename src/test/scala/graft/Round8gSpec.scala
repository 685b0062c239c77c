package graft

import org.apache.spark.sql.functions._

/** Round-8 seventh batch: MNN symmetry/exactness, path accounting,
  * and snapshot-diff conservation laws. */
class Round8gSpec extends SparkSpec {
  import spark.implicits._

  test("q275: trigram counts conserve the per-user event arithmetic") {
    val rows = Queries.queryMap("q275_path_trigrams")(spark, sf0001)
      .as[(String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (p, n) =>
      assert(p.split(">").length === 3)
      assert(n > 0)
    }
    // total trigrams over ALL paths = sum over users of max(0, n_events-2);
    // the query truncates to 20, so compare against the untruncated agg
    val perUser = graft.sources.Tables.events(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    val totalTrigrams = perUser.map { case (_, n) => math.max(0L, n - 2) }.sum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val all = graft.sources.Tables.events(spark, sf0001)
      .select(lag(col("event_type"), 2).over(w).as("p2"))
      .filter(col("p2").isNotNull).count()
    assert(all === totalTrigrams)
  }

  test("q276: pairs are symmetric top-1s and exact on a driver recompute") {
    val got = Queries.queryMap("q276_mutual_nn")(spark, sf0001)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, sim) => assert(a < b && sim <= 1.0001) }
    // driver-side exact recompute on the same sample (sf0.001 corpus is
    // smaller than the 1000 cap, so the sample is the whole table)
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    def cos(x: Array[Float], y: Array[Float]): Double = {
      var d = 0.0; var nx = 0.0; var ny = 0.0
      for (i <- x.indices) {
        d += x(i).toDouble * y(i).toDouble
        nx += x(i).toDouble * x(i).toDouble; ny += y(i).toDouble * y(i).toDouble
      }
      if (nx == 0.0 || ny == 0.0) 0.0 else d / (math.sqrt(nx) * math.sqrt(ny))
    }
    val top1 = vecs.map { case (i, x) =>
      i -> vecs.filter(_._1 != i)
        .map { case (j, y) => (j, cos(x, y)) }
        .minBy { case (j, s) => (-s, j) }._1
    }.toMap
    val expected = top1.collect {
      case (a, b) if top1(b) == a && a < b => (a, b)
    }.toSet
    assert(got.map(r => (r._1, r._2)).toSet === expected)
  }

  test("q277: diff categories partition both snapshots") {
    val r = Queries.queryMap("q277_snapshot_diff")(spark, sf0001)
      .as[(Long, Long, Long, Long, Long, Long)].first()
    val (t1, t2, added, removed, changed, unchanged) = r
    assert(t1 === removed + changed + unchanged)
    assert(t2 === added + changed + unchanged)
    assert(t2 > 0)
  }
}
