package graft

import org.apache.spark.sql.functions._

/** Round-8 sixth batch: invariants past the hash gate — cohort
  * accounting, NTILE balance, Lorenz monotonicity, Fano recompute,
  * and the jaccard-subset-of-mutual-containment theorem with a
  * constructed counterexample for the converse. */
class Round8fSpec extends SparkSpec {
  import spark.implicits._

  test("q269: conversion accounting and a driver-side median recompute") {
    val rows = Queries.queryMap("q269_conversion_latency")(spark, sf0001)
      .as[(String, Long, Long, Option[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, c, med) =>
      assert(c <= n)
      assert(med.isDefined === (c > 0), "median present iff anyone converted")
    }
    // recompute the full relation driver-side
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      .as[(Long, String, Long)].collect()
    val su = ev.filter(_._2 == "signup").groupBy(_._1).view.mapValues(_.map(_._3).min)
    val pu = ev.filter(_._2 == "purchase").groupBy(_._1).view.mapValues(_.map(_._3).min)
    val lats = su.toSeq.flatMap { case (u, sTs) =>
      pu.get(u).filter(_ >= sTs).map(p => (u, sTs, (p - sTs) / 1000000))
    }
    val expectedConverted = lats.size.toLong
    assert(rows.map(_._3).sum === expectedConverted)
    assert(rows.map(_._2).sum === su.size.toLong)
  }

  test("q270: each NTILE dimension partitions users into near-equal quartiles") {
    val rows = Queries.queryMap("q270_rfm_segments")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect()
    val total = rows.map(_._4).sum
    for ((dim, pick) <- Seq[(String, ((Long, Long, Long, Long)) => Long)](
        ("r", _._1), ("f", _._2), ("m", _._3))) {
      val byQ = rows.groupBy(pick).view.mapValues(_.map(_._4).sum)
      assert(byQ.keySet === Set(1L, 2L, 3L, 4L), s"$dim quartiles present")
      assert(byQ.values.max - byQ.values.min <= 1L,
        s"$dim NTILE imbalance: $byQ")
      assert(byQ.values.sum === total)
    }
  }

  test("q271: Lorenz shares are monotone, bounded, and front-loaded") {
    val rows = Queries.queryMap("q271_lorenz_curve")(spark, sf0001)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(10L, 20L, 30L, 40L, 50L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 > a._3, "cumulative share must strictly increase")
    }
    rows.foreach { case (pct, _, share) =>
      assert(share <= 1000000L)
      // sorted descending: the top p% holds at least p% of revenue
      assert(share >= pct * 10000L - 1L, s"top $pct% below proportional share")
    }
  }

  test("q272: Fano factor recompute for the burstiest token") {
    val rows = Queries.queryMap("q272_token_burstiness")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val (tok, df, tot, fano) = rows.head
    val counts = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .filter(col("t") === tok)
      .groupBy("doc_id").agg(count(lit(1)).cast("long").as("x"))
      .as[(Long, Long)].collect().map(_._2)
    val nd = graft.sources.Tables.documents(spark, sf0001).count()
    assert(df === counts.length.toLong)
    assert(tot === counts.sum)
    val sx2 = counts.map(x => x * x).sum
    assert(fano === (nd * sx2 - tot * tot) * 1000000L / (nd * tot))
  }

  test("q273: unique passages are a subset of the source vocabulary") {
    val rows = Queries.queryMap("q273_unique_passage_ratio")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, vocab, uniq, ratio) =>
      assert(uniq <= vocab)
      assert(ratio === uniq * 1000000L / vocab)
    }
  }

  test("q274: jaccard pairs are PROVABLY a subset of mutual-containment pairs") {
    val row = Queries.queryMap("q274_dedup_method_agreement")(spark, sf0001)
      .as[(Long, Long, Long, Long)].first()
    // J = i/(na+nb-i) <= i/na and <= i/nb, so J >= t implies both
    // containments >= t: the jaccard-only bucket must be EMPTY.
    assert(row._2 === 0L, "jaccard-only pairs contradict the containment bound")
    // and the converse does not hold — a size-skewed constructed pair
    // passes mutual containment while failing jaccard:
    val i = 8.0; val na = 10.0; val nb = 10.0
    assert(i / na >= 0.8 && i / nb >= 0.8)
    assert(i / (na + nb - i) < 0.8)
  }
}
