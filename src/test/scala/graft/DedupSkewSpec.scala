package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The shingle document-frequency cap is THE skew guard for the
  * inverted-index dedup family: a shingle occurring in k documents emits
  * k(k-1)/2 candidate pair rows from the self-join, so one viral
  * boilerplate line on a Zipfian corpus is a quadratic blow-up. These
  * tests pin (1) the quadratic behavior without the cap, (2) the bound
  * with it, and (3) that capping ubiquitous shingles does not lose
  * genuinely near-duplicate pairs whose evidence is rare shingles. */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  // 60 docs sharing ONE viral trigram ("common header line"), each with an
  // otherwise-unique tail, plus one true near-dup pair (58/59) that shares
  // rare shingles only with itself.
  private lazy val skewed: DataFrame = {
    val viral = (0 until 58).map { i =>
      (i.toLong, s"common header line u${i}a u${i}b u${i}c u${i}d")
    }
    val nearDup = Seq(
      (58L, "common header line alpha beta gamma delta epsilon zeta"),
      (59L, "common header line alpha beta gamma delta epsilon eta"))
    (viral ++ nearDup).toDF("doc_id", "text")
  }

  private def candidateRows(idx: DataFrame): Long =
    idx.as("a").join(idx.as("b"),
      col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .count()

  test("uncapped: one viral shingle in k docs materializes k(k-1)/2 candidate rows") {
    val idx = Dedup.shingleIndex(skewed, "doc_id", "text", n = 3)
    // the viral trigram alone contributes C(60,2) = 1770 pair rows
    assert(candidateRows(idx) >= 60L * 59L / 2L,
      "expected the quadratic candidate blow-up the cap exists to prevent")
  }

  test("maxShingleDf drops the viral shingle and bounds candidates to sum C(df<=c, 2)") {
    val cap = 10L
    val idx = Dedup.shingleIndex(skewed, "doc_id", "text", n = 3, maxShingleDf = cap)
    val dfs = idx.groupBy("shingle").agg(count(lit(1)).as("df"))
      .select($"df").as[Long].collect()
    assert(dfs.forall(_ <= cap), s"a shingle above the cap survived: ${dfs.max}")
    // the provable bound: every kept shingle contributes at most C(df,2)
    val bound = dfs.map(d => d * (d - 1) / 2).sum
    val cands = candidateRows(idx)
    assert(cands <= bound && bound < 100L,
      s"capped candidates $cands exceed the per-shingle bound $bound")
  }

  test("capping ubiquitous shingles keeps pairs whose evidence is rare shingles") {
    val capped = Dedup.jaccardPairs(skewed, "doc_id", "text",
      n = 3, threshold = 0.5, maxShingleDf = 10L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(capped.contains((58L, 59L)),
      "the cap must not lose the genuinely near-duplicate pair")
    assert(capped.forall { case (a, b) => Set(a, b) == Set(58L, 59L) },
      s"viral-shingle-only pairs must not pass the threshold: $capped")
    // containment direction survives the cap the same way
    val cont = Dedup.containmentPairs(skewed, "doc_id", "text",
      n = 3, threshold = 0.5, maxShingleDf = 10L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(cont.contains((58L, 59L)) && cont.contains((59L, 58L)))
  }

  test("a cap above every df is hash-identical to no cap (the declared-query regime)") {
    def run(cap: Long) = Dedup.jaccardPairs(skewed, "doc_id", "text",
      n = 3, threshold = 0.1, maxShingleDf = cap)
      .select($"a_id", $"b_id", $"jaccard")
      .orderBy($"a_id", $"b_id").collect().toSeq
    assert(run(256L) === run(0L),
      "a cap above the corpus max df must not change any output row")
  }

  // 100 docs sharing a 52-token boilerplate block (50 shingles at df=100
  // each -> 50 * C(100,2) = 247,500 candidate rows) plus 3 unique tokens:
  // the duplication-dense regime where the frozen cap used to blow up.
  private lazy val dense: DataFrame = {
    val common = (0 until 52).map(j => s"c$j").mkString(" ")
    (0 until 100).map(i => (i.toLong, s"$common u${i}a u${i}b u${i}c"))
      .toDF("doc_id", "text")
  }

  test("adaptive cap resolves to the ladder max when candidates fit the budget") {
    // skewed corpus: cand(1024) = cand(uncapped) ~ 1770 + tails, budget =
    // 512*60 = 30720 -> the solve keeps everything (the oracle regime)
    assert(Dedup.adaptiveShingleDfCap(skewed, "doc_id", "text", n = 3) === 1024L)
  }

  test("adaptive cap tightens itself on a duplication-dense corpus") {
    // dense corpus: budget = 512*100 = 51,200 < 247,500 at any cap >= 100,
    // so every ladder value that keeps the boilerplate shingles (128..1024)
    // is rejected and the solve lands on 64 (which drops them; remaining
    // shingles are unique, cand = 0)
    val cap = Dedup.adaptiveShingleDfCap(dense, "doc_id", "text", n = 3)
    assert(cap === 64L, s"expected the solve to tighten to 64, got $cap")
    // and the resulting join materializes ~zero candidate rows
    val idx = Dedup.shingleIndex(dense, "doc_id", "text", n = 3, maxShingleDf = cap)
    assert(candidateRows(idx) < 100L)
  }

  test("pairStatsAdaptive equals pairStats under the solved cap, bit for bit") {
    def norm(df: DataFrame) = df.orderBy($"a_id", $"b_id").collect().toSeq
    val cap = Dedup.adaptiveShingleDfCap(skewed, "doc_id", "text", n = 3)
    assert(norm(Dedup.pairStatsAdaptive(skewed, "doc_id", "text", n = 3)) ===
      norm(Dedup.pairStats(skewed, "doc_id", "text", n = 3, maxShingleDf = cap)))
  }

  test("adaptive cap honors a caller-supplied budget override") {
    // a huge budget accepts the ladder max even on the dense corpus
    assert(Dedup.adaptiveShingleDfCap(dense, "doc_id", "text", n = 3,
      budgetPerDoc = 1000000L) === 1024L)
    // a zero budget rejects every ladder value that admits any candidate
    // and floors at 32 (skewed corpus: even df=2 shingles contribute rows)
    assert(Dedup.adaptiveShingleDfCap(skewed, "doc_id", "text", n = 3,
      budgetPerDoc = 0L) === 32L)
  }
}
