package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Round-7 third block: the semantics and plan shapes the q201–q208
  * oracle hashes can't pin — pigeonhole exhaustiveness, skew bounds,
  * quantization contracts, and the no-window/no-nested-loop hygiene. */
class Round7cSpec extends SparkSpec {
  import spark.implicits._

  // ---- crossSourceGramShare ------------------------------------------------

  test("crossSourceGramShare counts DISTINCT shared grams, symmetric-free") {
    val t = Seq(
      (1L, "s1", "a b c d e f g h x"),   // grams: "a..h", "b..x"
      (2L, "s2", "a b c d e f g h y"),   // shares "a..h" with s1
      (3L, "s2", "a b c d e f g h z"),   // same shared gram AGAIN — distinct!
      (4L, "s3", "p q r s t u v w")
    ).toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokens(col("text")).as("toks"))
    val got = Dedup.crossSourceGramShare(t, n = 8)
      .as[(String, String, Long)].collect().toSet
    // one distinct 8-gram shared between s1 and s2 (doc 3's copy must not
    // double-count); s3 shares nothing
    assert(got == Set(("s1", "s2", 1L)))
  }

  test("crossSourceGramShare: a viral gram's fan-out is bounded by source count") {
    // the same gram in 50 docs across 3 sources → the distinct projection
    // reduces it to 3 rows → C(3,2) = 3 pair rows, NOT C(50,2)
    val docs = (1 to 50).map(i => (i.toLong, s"s${i % 3}", "a b c d e f g h"))
    val t = docs.toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokens(col("text")).as("toks"))
    val got = Dedup.crossSourceGramShare(t, n = 8).collect()
    assert(got.length == 3 && got.forall(_.getLong(2) == 1L))
  }

  // ---- q208 sampled diagnostic ---------------------------------------------

  test("q208 sample covers corpora at or below SimhashSampleN in full — sampled == exhaustive") {
    // the scale contract: the declared histogram runs over a consistent
    // md5-priority sample of SimhashSampleN docs; any corpus at or below
    // that size (the sf0.01 hash-gate scale included) is sampled in FULL,
    // so the sampled form must equal the exhaustive full-corpus form
    // there — the equivalence that lets the oracle stay exact while the
    // declared plan's candidate cost stays constant in corpus size.
    val d = "/root/testdata/sf0.001"
    assert(graft.sources.Tables.documents(spark, d).count()
      <= Round7cQueries.SimhashSampleN, "fixture must fit inside the sample")
    val sampled = Queries.queryMap("q208_simhash_hamming_hist")(spark, d)
      .as[(Long, Long)].collect().toSeq
    val full = Dedup.simhashNearDups(
        graft.sources.Tables.documents(spark, d), "doc_id", "text",
        maxHamming = 7, bands = 8)
      .groupBy(col("hamming").cast("long").as("hamming"))
      .agg(count(lit(1)).as("n_pairs")).orderBy("hamming")
      .as[(Long, Long)].collect().toSeq
    assert(sampled === full, "sampled histogram diverged from the exhaustive form")
  }

  // ---- blocklistStats ------------------------------------------------------

  test("blocklistStats: hit counting, flag rate, and list hygiene") {
    val docs = Seq(
      ("s1", "bad bad word here"),
      ("s1", "all clean text here"),
      ("s2", "clean")
    ).toDF("source", "text")
    val r = TextAnalysis.blocklistStats(docs, "source", "text", Seq("bad"))
      .orderBy("source")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(r(0) == (("s1", 2L, 1L, 2L, 0.5)))
    assert(r(1) == (("s2", 1L, 0L, 0L, 0.0)))
    // terms holding quote/backslash metacharacters match LITERALLY (the
    // predicate is Column-built, not interpolated SQL — nothing to escape)
    val meta = Seq(("s1", "it's x \\ y")).toDF("source", "text")
    val m = TextAnalysis.blocklistStats(meta, "source", "text", Seq("it's", "\\"))
      .as[(String, Long, Long, Long, Double)].collect()
    assert(m(0) == (("s1", 1L, 1L, 2L, 1.0)))
    intercept[IllegalArgumentException] {
      TextAnalysis.blocklistStats(docs, "source", "text", Nil)
    }
  }

  test("blocklistStats plan: no join, no UDF — one codegen'd projection + agg") {
    val docs = Seq(("s1", "a b c")).toDF("source", "text")
    val plan = TextAnalysis.blocklistStats(docs, "source", "text", Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "blocklist must compile into the projection")
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("udf"))
  }

  // ---- simhash hamming histogram (pigeonhole exhaustiveness) ---------------

  test("subset-blocked simhash join (bands=8, s=5) finds EVERY pair at hamming <= 3") {
    // the Manku-style piece-subset scheme: hamming <= 3 flips at most 3 of
    // 8 pieces, so some 5-piece subset agrees in full — blocking on all
    // C(8,5)=56 subsets is exhaustive, and popcount verification makes the
    // output the exact all-pairs relation regardless of blocking
    val docs = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .limit(80)
    val blocked = Dedup.simhashNearDups(docs, "doc_id", "text",
        maxHamming = 3, bands = 8)
      .select("a_id", "b_id", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val sigs = docs.select(col("doc_id"),
        Dedup.simhash32(TextAnalysis.tokens(col("text"))).as("s"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(blocked == brute,
      "subset blocking must be exhaustive at hamming <= 3")
  }

  test("8-band simhash join finds EVERY pair at hamming <= 7 (pigeonhole)") {
    val docs = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .limit(60)
    val banded = Dedup.simhashNearDups(docs, "doc_id", "text",
        maxHamming = 7, bands = 8)
      .select("a_id", "b_id", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    // brute force over the exact signatures
    val sigs = docs.select(col("doc_id"),
        Dedup.simhash32(TextAnalysis.tokens(col("text"))).as("s"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 7
    } yield (a, b, h)).toSet
    assert(banded == brute,
      s"banded join missed ${(brute -- banded).size} pairs / invented ${(banded -- brute).size}")
  }

  // ---- embedding screens ---------------------------------------------------

  test("normStatsByGroup: exact micro-sum mean, min/max selection") {
    val vs = Seq(
      (1L, 0, Array(3.0f, 4.0f)),   // norm 5
      (2L, 0, Array(0.0f, 1.0f)),   // norm 1
      (3L, 1, Array(6.0f, 8.0f))    // norm 10
    ).toDF("vec_id", "label", "embedding")
    val r = Similarity.normStatsByGroup(vs, "label").orderBy("label")
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(r(0) == ((0, 2L, 1.0, 5.0, 3.0)))
    assert(r(1) == ((1, 1L, 10.0, 10.0, 10.0)))
  }

  test("dimScreen: constant dimension flagged dead, varying one not") {
    val vs = Seq(
      (1L, Array(0.5f, 0.1f)),
      (2L, Array(0.5f, 0.9f)),
      (3L, Array(0.5f, 0.4f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.dimScreen(vs)
      .as[(Long, Long, Double, Double, Int)].collect()
    assert(r(0) == ((1L, 3L, 0.5, 0.0, 1)), s"constant dim: ${r(0)}")
    assert(r(1)._5 == 0 && r(1)._4 > 0.05, s"varying dim: ${r(1)}")
  }

  test("dimScreen plan: value rides as one long — no array past the explode") {
    val vs = Seq((1L, Array(0.5f, 0.1f))).toDF("vec_id", "embedding")
    val plan = Similarity.dimScreen(vs).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "per-dim stats must not use a window")
    assert(plan.contains("HashAggregate"), "expected two-phase hash agg")
  }

  // ---- zipf decades plan ---------------------------------------------------

  test("q204 plan: TakeOrderedAndProject top-16, no partition-less window") {
    val df = Queries.queryMap("q204_zipf_decades")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      "vocab top-16 must be TakeOrderedAndProject, not a global sort")
    assert(!plan.contains("Window"), "rank must be count-of-better, not a window")
    val r = df.collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    assert(r.head.getDouble(3) == 1.0, "rank-1 decay must be exactly 1.0")
  }

  // ---- q202 plan -----------------------------------------------------------

  test("q202 plan: equi-join on gram, never a nested loop") {
    val df = Queries.queryMap("q202_cross_source_grams")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "cross-source share must join on the gram key")
  }
}
