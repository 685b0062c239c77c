package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextCat, Winnow}

/** Round-7 second block: TextCat rank-profile classification and MOSS
  * winnowing fingerprints — the semantics the oracle hash can't pin
  * (guarantees, edge shapes, plan hygiene). */
class Round7bSpec extends SparkSpec {
  import spark.implicits._

  // ---- TextCat -------------------------------------------------------------

  test("charTrigrams: sliding window, short-text empty contract") {
    val r = Seq("abcd", "ab", "abc").toDF("text")
      .select(TextCat.charTrigrams(col("text")).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(r(0) == Seq("abc", "bcd"))
    assert(r(1) == Seq.empty)
    assert(r(2) == Seq("abc"))
  }

  test("classify: separable classes recovered, absent-gram penalty decides") {
    // two classes with disjoint trigram inventories — every doc must be
    // pulled to its own class (its grams are ALL absent from the other
    // profile, so the other distance is the maximum penalty nd*k)
    val docs = Seq(
      (1L, "aa", "xxxx xxxx xxxx"),
      (2L, "aa", "xxxx xxzx xxxx"),
      (3L, "bb", "yyyy yyyy yyyy"),
      (4L, "bb", "yyyy yywy yyyy")
    ).toDF("doc_id", "lang", "text")
    val pred = TextCat.classify(docs, "doc_id", "lang", "text", k = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(1L -> "aa", 2L -> "aa", 3L -> "bb", 4L -> "bb"))
  }

  test("classify: argmin ties break to the lexicographically smaller class") {
    // one doc per class with IDENTICAL text: both profiles equal, so every
    // doc is at distance 0 from both classes — the declared tie rule must
    // pick the smaller label for all of them
    val docs = Seq(
      (1L, "zz", "same same same"),
      (2L, "aa", "same same same")
    ).toDF("doc_id", "lang", "text")
    val pred = TextCat.classify(docs, "doc_id", "lang", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(1L -> "aa", 2L -> "aa"))
  }

  test("classify: the model join is broadcast (plan pin)") {
    val docs = Seq((1L, "aa", "abc def ghi")).toDF("doc_id", "lang", "text")
    val plan = TextCat.classify(docs, "doc_id", "lang", "text", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  // ---- Winnow --------------------------------------------------------------

  private def toksDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokens(col("text")).as("toks"))

  test("winnowing guarantee: a shared run of n+w-1 tokens shares a fingerprint") {
    // n=3, w=4: any shared token run of length >= 6 spans a full window of
    // 4 consecutive gram hashes, whose minimum both docs must select
    val run = "alpha beta gamma delta epsilon zeta"
    val t = toksDf(
      1L -> s"one two three $run seven eight",
      2L -> s"nine ten $run eleven twelve thirteen")
    val pairs = Winnow
      .sharedFingerprintPairs(t, n = 3, w = 4, maxFpDf = 0L, minShared = 1L)
      .collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L)
  }

  test("fingerprint density: fewer fingerprints than grams, never zero") {
    val text = (1 to 50).map(i => s"tok$i").mkString(" ") // 48 grams
    val fp = Winnow.fingerprintIndex(toksDf(1L -> text), n = 3, w = 4)
      .count()
    assert(fp >= 1 && fp < 48)
  }

  test("degenerate sizes: under one window keeps the global min; no grams, no rows") {
    // 4 tokens -> 2 grams < w=4 -> exactly one fingerprint (the min)
    val one = Winnow.fingerprintIndex(toksDf(1L -> "a b c d"), n = 3, w = 4)
    assert(one.count() == 1)
    // 2 tokens -> no 3-grams -> absent entirely
    val none = Winnow.fingerprintIndex(toksDf(2L -> "a b"), n = 3, w = 4)
    assert(none.count() == 0)
  }

  test("winnowing pair join stays an equi-join (no nested-loop plan)") {
    val t = toksDf(1L -> "a b c d e f g", 2L -> "a b c d e f h")
    val plan = Winnow.sharedFingerprintPairs(t, n = 3, w = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}
