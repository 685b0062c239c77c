package graft

import org.apache.spark.sql.functions._

/** Round-8 additions: semantics the q235–q240 oracle hashes can't pin
  * (allocation invariants, quantization exactness) and the plan-hygiene
  * rules (no partition-less windows over full relations, integer-only
  * shuffles in the centroid screen, broadcast small sides). */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  test("q236/q243: quotas sum exactly to the budget and differ from plain floor by at most 1") {
    for (name <- Seq("q236_stratified_quota", "q243_dedup_quota")) {
      val rows = Queries.queryMap(name)(spark, sf0001)
        .as[(String, Long, Long)].collect()
      assert(rows.map(_._3).sum === 1000L,
        s"$name: largest-remainder must hit the budget exactly")
      val total = rows.map(_._2).sum
      rows.foreach { case (src, n, q) =>
        val base = 1000L * n / total
        assert(q == base || q == base + 1L,
          s"$name/$src got $q, outside [floor, floor+1] = [$base, ${base + 1}]")
      }
    }
  }

  test("q242: a duplicate-heavy source scores strictly lower Simpson diversity") {
    val docs = Seq(
      ("rep", "a a a a a a a a b b"),
      ("div", "a b c d e f g h i j")
    ).toDF("source", "text").withColumn("doc_id", lit(1L))
    import graft.operators.TextAnalysis
    val tok = docs.select(col("source"),
      explode(TextAnalysis.tokens(col("text"))).as("token"))
    val c = tok.groupBy("source", "token").agg(count(lit(1)).as("c"))
    val a = c.groupBy("source")
      .agg(sum(col("c")).cast("long").as("n"),
        sum(col("c") * (col("c") - 1)).cast("long").as("s2"))
      .select(col("source"),
        (lit(1.0) - col("s2").cast("double")
          / (col("n").cast("double") * (col("n") - 1))).as("sd"))
      .as[(String, Double)].collect().toMap
    assert(a("div") === 1.0, "all-distinct tokens must score exactly 1")
    assert(a("rep") < 0.5, s"repeated-token source must score low, got ${a("rep")}")
  }

  test("q237: vocabulary growth is monotone and ends at the full distinct-token count") {
    val rows = Queries.queryMap("q237_vocab_growth")(spark, sf0001)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.length === 4)
    assert(rows.map(_._2).sliding(2).forall { case Array(a, b) => a <= b },
      "vocab curve must be monotone")
    val full = graft.sources.Tables.documents(spark, sf0001)
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
      .distinct().count()
    assert(rows.last._2 === full, "the n-doc prefix must reach the full vocabulary")
  }

  test("q237 plan: the global ordinal comes from GlobalOrder — no partition-less window") {
    val plan = Queries.queryMap("q237_vocab_growth")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q237 must not plan a window:\n$plan")
  }

  test("q239: only integer codes ride the shuffle; the centroid table broadcasts") {
    val df = Queries.queryMap("q239_centroid_confusion")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop") == false,
      "centroid join should broadcast the 640-row centroid side")
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast centroid join:\n$plan")
    // confusion counts cover every vec exactly once
    val n = df.agg(sum(col("n"))).first().getLong(0)
    assert(n === graft.sources.Tables.embeddings(spark, sf0001).count(),
      "every vector must be assigned to exactly one centroid")
  }

  test("q239: quantization is shift-invariant where it must be — distances respect the +2 shift") {
    // the +2 shift exists so both engines' integer divisions agree on
    // non-negative sums; it must not change any assignment: recompute
    // with +4 and compare the confusion table
    def run(shift: Double) = {
      val q = graft.sources.Tables.embeddings(spark, sf0001)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("i", "v")))
        .select(col("vec_id"), col("label"), col("i"),
          floor((col("v").cast("double") + lit(shift)) * lit(1024.0))
            .cast("long").as("qv"))
      val cent = q.groupBy(col("label").as("clabel"), col("i"))
        .agg(expr("sum(qv) div count(*)").as("cq"))
      q.join(broadcast(cent), Seq("i"))
        .groupBy("vec_id", "label", "clabel")
        .agg(sum((col("qv") - col("cq")) * (col("qv") - col("cq"))).as("d2"))
        .groupBy("vec_id", "label")
        .agg(min(struct(col("d2"), col("clabel"))).as("w"))
        .select(col("label"), col("w.clabel").as("pred"))
        .groupBy("label", "pred").agg(count(lit(1)).as("n"))
        .orderBy("label", "pred")
        .as[(Int, Int, Long)].collect().toSeq
    }
    assert(run(2.0) === run(4.0), "assignments must be invariant to the shift constant")
  }

  test("q240 plan: the top-3 comes from the tournament — no window over the full score relation") {
    val df = Queries.queryMap("q240_doc_keywords")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // every window in the plan must be PARTITIONED by doc_id (no global
    // window anywhere), and the top-3 must push down as WindowGroupLimit
    // — Catalyst's partial-then-final per-partition top-k, i.e. the
    // tournament executed before the shuffle, so no task ever sorts more
    // than its own partition's 3-per-doc survivors
    val unpartitioned = plan.linesIterator
      .filter(l => l.contains("windowspecdefinition"))
      .count(l => !l.contains("doc_id"))
    assert(unpartitioned === 0, s"q240 has a window not partitioned by doc_id:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"top-3 should push down as WindowGroupLimit:\n$plan")
    // rn is always 1..3 per doc
    val bad = df.groupBy("doc_id").agg(max(col("rn")).as("m"), count(lit(1)).as("c"))
      .filter(col("m") =!= col("c") || col("m") > 3).count()
    assert(bad === 0L, "per-doc ranks must be dense 1..k<=3")
  }

  test("q235: decay weights are exact powers of two and the clamp holds") {
    val rows = Queries.queryMap("q235_decayed_activity")(spark, sf0001)
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._2 > 0L))
    // the score order is the declared total order
    assert(rows.sortBy(r => (-r._2, r._1)).toSeq === rows.toSeq)
    // no user can exceed events * 2^20 (weight cap) — the clamp bound
    val perUser = graft.sources.Tables.events(spark, sf0001)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    rows.foreach { case (u, s) =>
      assert(s <= perUser(u) * (1L << 20), s"user $u score $s exceeds the 2^20 cap")
    }
  }
}
