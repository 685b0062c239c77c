package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Dedup, Privacy, Similarity, Skew, Splits, TextAnalysis}

/** Round-7 LLM-pipeline operator pack: skew-safe per-key top-k,
  * token-budget selection, exact-substring shared spans, SemDeDup
  * decisions, vocabulary/OOV coverage. Each operator is pinned against
  * the single-window textbook form it replaces (equality is the whole
  * point: same answer, scale-safe shape). */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerKey equals the per-key window form on a skewed input") {
    // one giant key (the shape the tournament exists for) + two small ones
    val rows = (1 to 900).map(i => ("hot", i.toLong)) ++
      (1 to 15).map(i => ("warm", (1000 + i).toLong)) ++
      Seq(("cold", 5000L))
    val df = rows.toDF("k", "v").repartition(7) // many input partitions
    val got = Skew.topKPerKey(df, Seq(col("k")), Seq(col("v")), k = 10)
      .orderBy("k", "v").collect().map(r => (r.getString(0), r.getLong(1)))
    val w = Window.partitionBy("k").orderBy("v")
    val want = rows.toDF("k", "v")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("k", "v")
      .orderBy("k", "v").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === want.toSeq)
    // keys smaller than k keep all their rows
    assert(got.count(_._1 == "cold") === 1)
  }

  test("topKPerKey rejects reserved column collisions and bad k") {
    val df = Seq(("a", 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.topKPerKey(df, Seq(col("k")), Seq(col("v")), k = 0)
    }
    intercept[IllegalArgumentException] {
      Skew.topKPerKey(df.withColumnRenamed("v", "__graft_rn"),
        Seq(col("k")), Seq(col("__graft_rn")), k = 1)
    }
  }

  test("budgetSelect equals the per-group running-sum window form") {
    val rows = Seq(
      ("g1", 10L, 5L), ("g1", 11L, 3L), ("g1", 12L, 2L), ("g1", 13L, 2L),
      ("g2", 20L, 10L), // over budget alone: nothing from g2
      ("g3", 30L, 8L)) // exactly the budget: kept (inclusive <=)
    val df = rows.toDF("src", "id", "w")
    val got = Splits.budgetSelect(df, "src",
        Seq(col("w").desc, col("id")), "w", budget = 8L)
      .select("src", "id", "cum_w")
      .orderBy("src", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val w = Window.partitionBy("src").orderBy(col("w").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum_w", sum("w").over(w))
      .filter(col("cum_w") <= 8L).select("src", "id", "cum_w")
      .orderBy("src", "id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
    assert(got.map(_._1).toSet === Set("g1", "g3"))
    assert(got.filter(_._1 == "g1").map(_._2).toSeq === Seq(10L, 11L))
  }

  test("budgetSelect: null weights ride along as zero, cum stays non-null") {
    val df = Seq(("g", 1L, Some(4L)), ("g", 2L, None), ("g", 3L, Some(3L)))
      .toDF("src", "id", "w")
    // sort by id: cum = 4, 4, 7 — the null row is kept, not dropped
    val got = Splits.budgetSelect(df, "src", Seq(col("id")), "w", budget = 7L)
      .select("id", "cum_w").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 4L), (2L, 4L), (3L, 7L)))
  }

  test("sharedSpanPairs finds the longest verbatim run, not just any gram hit") {
    val base = (1 to 10).map(i => s"w$i").mkString(" ") // 10 shared tokens
    val docs = Seq(
      (1L, s"p1 p2 p3 p4 p5 p6 p7 p8 $base"), // run at positions 9..18
      (2L, s"$base q1 q2 q3 q4 q5 q6 q7 q8"), // run at positions 1..10
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12") // unrelated
    ).toDF("doc_id", "text")
    val got = Dedup.sharedSpanPairs(Dedup.docToks(docs, "doc_id", "text"),
        n = 8, maxGramDf = 64L, minSpan = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // 10-token shared run -> 3 chained 8-grams on one diagonal -> span 10
    assert(got.toSeq === Seq((1L, 2L, 10L)))
  }

  test("sharedSpanPairs: two disjoint shared runs report the longer one") {
    val runA = (1 to 9).map(i => s"a$i").mkString(" ")  // 9 tokens -> span 9
    val runB = (1 to 12).map(i => s"b$i").mkString(" ") // 12 tokens -> span 12
    val docs = Seq(
      (1L, s"$runA x1 x2 $runB"),
      (2L, s"$runB y1 y2 y3 $runA")
    ).toDF("doc_id", "text")
    val got = Dedup.sharedSpanPairs(Dedup.docToks(docs, "doc_id", "text"),
        n = 8, maxGramDf = 64L, minSpan = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 12L)))
  }

  test("sharedSpanPairs: the df cap silences viral boilerplate grams") {
    val boiler = (1 to 8).map(i => s"c$i").mkString(" ")
    val docs = (1L to 5L).map(i =>
      (i, s"$boiler u${i}a u${i}b u${i}c")).toDF("doc_id", "text")
    val toks = Dedup.docToks(docs, "doc_id", "text")
    // df of the boilerplate gram is 5: cap 4 kills it, cap 64 keeps it
    assert(Dedup.sharedSpanPairs(toks, n = 8, maxGramDf = 4L, minSpan = 8)
      .count() === 0L)
    assert(Dedup.sharedSpanPairs(toks, n = 8, maxGramDf = 64L, minSpan = 8)
      .count() === 10L) // C(5,2) pairs, span 8 each
  }

  test("semDedupKeep keeps the lowest id of each semantic group per cell") {
    val cents = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)))
    val vecs = Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(0.9f, 0.1f)), // cell 0: near-dups -> 1 dropped
      (2L, Seq(0f, 1f)), (3L, Seq(0.1f, 0.9f)), // cell 1: near-dups -> 3 dropped
      (4L, Seq(0.9f, -0.4f)) // cell 0 but dissimilar enough at 0.99
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDedupKeep(vecs, threshold = 0.99, centroids = cents)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq((0L, 0L, 1), (1L, 0L, 0), (2L, 1L, 1),
      (3L, 1L, 0), (4L, 0L, 1)))
  }

  test("oovStats: exact counts against a hand-computed fixture") {
    // corpus counts: a=3, b=2, c=1 -> top-2 vocab {a, b}
    val docs = Seq((1L, "a a b"), (2L, "b c a")).toDF("doc_id", "text")
    val got = TextAnalysis.oovStats(docs, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq((1L, 3L, 0L, 0.0), (2L, 3L, 1L, 0.3333)))
  }

  test("round-7 query plans keep their scale shape") {
    // q186: selection rides GlobalOrder — the plan must contain NO window
    // at all (the whole point is replacing the per-source running-sum
    // window), and no nested-loop join (the base join is an equi-join)
    val p186 = Queries.queryMap("q186_token_budget_select")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p186.contains("WindowExec") && !p186.contains("Window "),
      s"q186 regressed to a window plan:\n$p186")
    assert(!p186.contains("BroadcastNestedLoopJoin") &&
      !p186.contains("CartesianProduct"),
      s"q186 grew a non-equi join:\n$p186")
    // q187: gram equi-join only — a cartesian/NLJ here is the k² trap
    val p187 = Queries.queryMap("q187_shared_span")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p187.contains("BroadcastNestedLoopJoin") &&
      !p187.contains("CartesianProduct"),
      s"q187 pair generation is not an equi-join:\n$p187")
    // q185: the vocabulary must reach the probe side as a BROADCAST (16
    // rows), and the top-16 itself must be TakeOrderedAndProject, not a
    // global sort
    val p185 = Queries.queryMap("q185_vocab_oov")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p185.contains("BroadcastExchange"),
      s"q185 vocabulary is not broadcast:\n$p185")
    assert(p185.contains("TakeOrderedAndProject"),
      s"q185 top-16 vocab plans as a global sort:\n$p185")
  }

  test("Bpe.merges learns hand-checkable merges with greedy left-to-right apply") {
    // "aaa"x2: pairs (a,a) weight 4; "ab"x3: (a,b) weight 3
    val tc = Seq(("aaa", 2L), ("ab", 3L)).toDF("tok", "c")
    val got = Bpe.merges(tc, rounds = 3).orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1 merges (a,a) -> "aaa" becomes [aa, a] (GREEDY: never [a, aa]);
    // round 2 merges (a,b); round 3 the leftover (aa, a)
    assert(got.toSeq === Seq((1, "a a", "aa", 4L), (2, "a b", "ab", 3L),
      (3, "aa a", "aaa", 2L)))
  }

  test("Bpe.merges: disjoint adjacent occurrences all merge in one round") {
    // <a><b><a><b>: both (a,b) occurrences must merge in round 1 (the
    // sentinel encoding's whole point — no boundary-consumption skips),
    // leaving (ab, ab) as round 2's only pair
    val tc = Seq(("abab", 5L)).toDF("tok", "c")
    val got = Bpe.merges(tc, rounds = 2).orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq((1, "ab", 10L), (2, "abab", 5L)))
  }

  test("Bpe.appliedSymbolCounts: greedy apply yields hand-checkable symbol counts") {
    // same corpus as the merges test; after 2 rounds ((a,a) then (a,b)):
    // "aaa" -> [aa, a] = 2 symbols, "ab" -> [ab] = 1 symbol
    val tc = Seq(("aaa", 2L), ("ab", 3L)).toDF("tok", "c")
    val got = Bpe.appliedSymbolCounts(tc, rounds = 2).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got === Map("aaa" -> 2, "ab" -> 1))
    // rounds=1: only (a,a) trained -> "ab" stays 2 symbols
    val one = Bpe.appliedSymbolCounts(tc, rounds = 1).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(one === Map("aaa" -> 2, "ab" -> 2))
  }

  test("Bpe.merges rejects tokens containing sentinel characters") {
    val tc = Seq(("a<b", 1L)).toDF("tok", "c")
    val e = intercept[Exception] {
      Bpe.merges(tc, rounds = 1).collect()
    }
    assert(e.getMessage.contains("sentinel") ||
      e.getCause != null && e.getCause.getMessage.contains("sentinel"))
  }

  test("gopherFlags: each rule trips independently") {
    val longDoc = (1 to 60).map(i => s"word$i").mkString(" ") + " the the"
    val fixtures = Seq(
      (1L, longDoc),                                   // all rules pass
      (2L, "the the short doc"),                       // wc fails (4 < 50)
      (3L, ((1 to 60).map(_ => "extraordinarily").mkString(" ")) + " the the"),
      (4L, (1 to 60).map(i => s"word$i").mkString(" ")) // no stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFlags(fixtures, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(got(0) === ((1L, 1, 1, 1, 1)))
    assert(got(1) === ((2L, 0, 1, 1, 0)))  // only word count fails
    assert(got(2)._3 === 0, "17-char words must fail mean-word-length")
    assert(got(2)._5 === 0)
    assert(got(3) === ((4L, 1, 1, 0, 0))) // only stopwords fail
  }

  test("kAnonymity: suppression threshold is inclusive and per-combination") {
    val rows = Seq(
      (1L, "en", "a"), (2L, "en", "a"),          // group of 2
      (3L, "en", "b"),                            // singleton
      (4L, "fr", "a"), (5L, "fr", "a"), (6L, "fr", "a")) // group of 3
    val df = rows.toDF("id", "lang", "src")
    val got = Privacy.kAnonymity(df, Seq("lang", "src"), k = 2L)
      .select("id", "qi_n", "released").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq === Seq((1L, 2L, 1), (2L, 2L, 1), (3L, 1L, 0),
      (4L, 3L, 1), (5L, 3L, 1), (6L, 3L, 1)))
    // row count is preserved: the gate annotates, it never drops
    assert(Privacy.kAnonymity(df, Seq("lang"), k = 100L).count() === 6L)
  }

  test("perceptualHash: hand-checkable bits, re-encode robustness, near-dup pairs") {
    import org.apache.spark.sql.Row
    import graft.operators.{ImageIoCodec, Multimodal}
    def png(px: (Int, Int) => Int) =
      ImageIoCodec.encode(16, 16, Array.tabulate(256)(i => px(i % 16, i / 16)), "png")
    val white = 0xffffff
    val a = png((x, _) => if (x < 8) 0 else white) // left black, right white
    val aBmp = ImageIoCodec.encode(16, 16,
      Array.tabulate(256)(i => if (i % 16 < 8) 0 else white), "bmp")
    // b: top-left 2x2 grid cell flipped to white -> exactly 1 phash bit
    val b = png((x, y) => if (x < 2 && y < 2) white else if (x < 8) 0 else white)
    val c = png((x, _) => if (x < 8) white else 0) // inverted: negative hash
    val c2 = png((x, _) => if (x < 8) white else 0)
    val rows = new java.util.ArrayList[Row]()
    Seq((1L, a, "png"), (2L, aBmp, "bmp"), (3L, b, "png"),
      (4L, c, "png"), (5L, c2, "png"), (6L, null, "png")).foreach {
      case (id, bytes, fmt) => rows.add(Row(id, bytes, Row(fmt, 16, 16, null)))
    }
    val media = spark.createDataFrame(rows, Multimodal.mediaSchema)
    val hashed = Multimodal.perceptualHash(media, ImageIoCodec)
    val byId = hashed.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId.size === 5, "null-content row must drop out")
    // 8x8 cells, left 4 black right 4 white, MSB-first: 0x0F per cell row
    assert(byId(1L) === 0x0f0f0f0f0f0f0f0fL)
    assert(byId(1L) === byId(2L), "same pixels via PNG and BMP must hash equal")
    assert(java.lang.Long.bitCount(byId(1L) ^ byId(3L)) === 1)
    assert(byId(4L) === byId(5L))
    assert(byId(4L) < 0L, "inverted image must exercise the negative-hash path")
    val pairs = Multimodal.phashNearDups(hashed, maxHamming = 6)
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // {1,2,3} mutually within 1 bit; {4,5} identical; no cross pairs
    assert(pairs.toSeq === Seq((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1), (4L, 5L, 0)))
    intercept[IllegalArgumentException] {
      Multimodal.phashNearDups(hashed, maxHamming = 8, bands = 8)
    }
  }

  test("oovStats vocab boundary ties break lexicographically") {
    // a=2, b=2, c=2: top-2 is {a, b} by the (count desc, token asc) order
    val docs = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val got = TextAnalysis.oovStats(docs, "doc_id", "text", vocabSize = 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 1L), (2L, 1L))) // exactly c is OOV in each
  }
}
