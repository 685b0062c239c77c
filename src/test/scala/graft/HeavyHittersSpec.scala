package graft

import org.apache.spark.sql.functions._
import graft.functions.{HeavyHitters, HeavyHit}
import graft.operators.TextAnalysis

/** The Misra–Gries summary is validated by its mathematical guarantees
  * (like MinHash/HLL — SURVEY §2.2 non-hash surface), not a row-hash
  * oracle: which SUB-threshold items ride along is order-dependent, the
  * bounds are not.
  *
  * The fixture vocabulary is 31 distinct tokens, so the bounds tests run
  * with k = 8 — capacity BELOW the vocabulary — to force the decrement
  * (reduce) and kth-subtraction (merge) paths; k >= 31 would make every
  * assertion trivially true in the exact regime (which q97 covers). */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(toks: Seq[String]): Map[String, Long] =
    toks.groupBy(identity).view.mapValues(_.size.toLong).toMap

  /** Fixture corpus: all document tokens + their exact frequencies. */
  private lazy val (corpus, corpusExact): (Seq[String], Map[String, Long]) = {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .as[String].collect().toSeq
    (toks, exactCounts(toks))
  }

  /** The MG invariants: reported counts are lower bounds, true counts lie
    * within the error mass, and every item with true frequency > n/(k+1)
    * is present. */
  private def assertMgBounds(out: Seq[HeavyHit], exact: Map[String, Long],
                             n: Long, k: Int, ctx: String): Unit = {
    assert(out.nonEmpty && out.length <= k, s"[$ctx] size ${out.length} not in (0, $k]")
    out.foreach { h =>
      val t = exact(h.item)
      assert(h.count <= t, s"[$ctx] ${h.item}: reported ${h.count} > true $t")
      assert(t <= h.count + h.err, s"[$ctx] ${h.item}: true $t > ${h.count}+${h.err}")
    }
    val reported = out.map(_.item).toSet
    val mustHave = exact.collect { case (i, c) if c > n / (k + 1) => i }
    assert(mustHave.forall(reported),
      s"[$ctx] missing guaranteed heavy hitters: ${mustHave.filterNot(reported)}")
  }

  test("exact when distinct items fit the capacity (err = 0)") {
    val toks = Seq("a", "b", "a", "c", "a", "b")
    val out = spark.createDataset(toks)
      .select(udaf(HeavyHitters(8), org.apache.spark.sql.Encoders.STRING)(col("value")).as("h"))
      .select(explode(col("h")).as("h")).select("h.*").as[HeavyHit].collect()
    assert(out.forall(_.err == 0L))
    assert(out.map(h => h.item -> h.count).toMap === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("sub-capacity bounds hold across partitionings; frequent items guaranteed") {
    val k = 8 // below the 31-token vocabulary: decrements + merge reductions fire
    for (parts <- Seq(1, 8)) {
      val out = spark.createDataset(corpus).repartition(parts)
        .select(udaf(HeavyHitters(k), org.apache.spark.sql.Encoders.STRING)(col("value")).as("h"))
        .select(explode(col("h")).as("h")).select("h.*").as[HeavyHit].collect()
      assert(out.exists(_.err > 0L),
        s"parts=$parts: no error mass — capacity not exceeded, test is vacuous")
      assertMgBounds(out.toSeq, corpusExact, corpus.size.toLong, k, s"batch parts=$parts")
    }
  }

  test("summary accumulates incrementally over a stream (complete mode)") {
    // The same Aggregator runs as streaming state: partial buffers merge
    // across micro-batches exactly as they merge across tasks, so the
    // final summary obeys the same sub-capacity bounds as the batch run.
    implicit val sq = spark.sqlContext
    val k = 8
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = mem.toDF()
      .select(udaf(HeavyHitters(k), org.apache.spark.sql.Encoders.STRING)(col("value")).as("h"))
      .writeStream.format("memory").queryName("hh_stream").outputMode("complete").start()
    val (firstHalf, secondHalf) = corpus.splitAt(corpus.size / 2)
    mem.addData(firstHalf); q.processAllAvailable()
    mem.addData(secondHalf); q.processAllAvailable()
    q.stop()
    val out = spark.table("hh_stream")
      .select(explode(col("h")).as("h")).select("h.*").as[HeavyHit].collect()
    assertMgBounds(out.toSeq, corpusExact, corpus.size.toLong, k, "stream")
  }

  test("operator entry point reports the corpus's dominant tokens") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val out = TextAnalysis.topTokensApprox(docs, "text", k = 16)
      .orderBy(col("count").desc, col("item")).collect()
    assert(out.nonEmpty && out.length <= 16)
    // cross-check the top reported item against the exact groupBy count
    val exactTop = docs.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("t").count().orderBy(col("count").desc).head()
    val top = out.head
    assert(top.getLong(1) <= exactTop.getLong(1))
    assert(exactTop.getLong(1) <= top.getLong(1) + top.getLong(2))
  }
}
