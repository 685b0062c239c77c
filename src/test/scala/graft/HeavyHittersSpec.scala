package graft

import org.apache.spark.sql.functions._
import graft.functions.{HeavyHitters, HeavyHit}
import graft.operators.TextAnalysis

/** The Misra–Gries summary is validated by its mathematical guarantees
  * (like MinHash/HLL — SURVEY §2.2 non-hash surface), not a row-hash
  * oracle: which SUB-threshold items ride along is order-dependent, the
  * bounds are not. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exactCounts(toks: Seq[String]): Map[String, Long] =
    toks.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("exact when distinct items fit the capacity (err = 0)") {
    val toks = Seq("a", "b", "a", "c", "a", "b")
    val out = spark.createDataset(toks)
      .select(udaf(HeavyHitters(8), org.apache.spark.sql.Encoders.STRING)(col("value")).as("h"))
      .select(explode(col("h")).as("h")).select("h.*").as[HeavyHit].collect()
    assert(out.forall(_.err == 0L))
    assert(out.map(h => h.item -> h.count).toMap === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("bounds hold on real tokens across partitionings; frequent items guaranteed") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .as[String].collect().toSeq
    val exact = exactCounts(toks)
    val n = toks.size.toLong
    val k = 32
    for (parts <- Seq(1, 8)) {
      val out = spark.createDataset(toks).repartition(parts)
        .select(udaf(HeavyHitters(k), org.apache.spark.sql.Encoders.STRING)(col("value")).as("h"))
        .select(explode(col("h")).as("h")).select("h.*").as[HeavyHit].collect()
      assert(out.nonEmpty && out.length <= k)
      out.foreach { h =>
        val t = exact(h.item)
        assert(h.count <= t, s"${h.item}: reported ${h.count} > true $t")
        assert(t <= h.count + h.err, s"${h.item}: true $t > ${h.count}+${h.err}")
      }
      // the MG guarantee: every item with true freq > n/(k+1) is reported
      val reported = out.map(_.item).toSet
      val mustHave = exact.collect { case (i, c) if c > n / (k + 1) => i }
      assert(mustHave.forall(reported), s"missing guaranteed heavy hitters at parts=$parts: " +
        s"${mustHave.filterNot(reported)}")
    }
  }

  test("summary accumulates incrementally over a stream (update mode)") {
    // The same Aggregator runs as streaming state: partial buffers merge
    // across micro-batches exactly as they merge across tasks, so the
    // final summary obeys the same bounds as the batch run.
    implicit val sq = spark.sqlContext
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val toks = docs.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .as[String].collect().toSeq
    val exact = exactCounts(toks)
    val k = 32
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    val q = mem.toDF()
      .select(udaf(HeavyHitters(k), org.apache.spark.sql.Encoders.STRING)(col("value")).as("h"))
      .writeStream.format("memory").queryName("hh_stream").outputMode("complete").start()
    val (firstHalf, secondHalf) = toks.splitAt(toks.size / 2)
    mem.addData(firstHalf); q.processAllAvailable()
    mem.addData(secondHalf); q.processAllAvailable()
    q.stop()
    val out = spark.table("hh_stream")
      .select(explode(col("h")).as("h")).select("h.*").as[HeavyHit].collect()
    assert(out.nonEmpty && out.length <= k)
    out.foreach { h =>
      val t = exact(h.item)
      assert(h.count <= t && t <= h.count + h.err,
        s"${h.item}: true $t outside [${h.count}, ${h.count}+${h.err}]")
    }
    val n = toks.size.toLong
    val mustHave = exact.collect { case (i, c) if c > n / (k + 1) => i }
    val reported = out.map(_.item).toSet
    assert(mustHave.forall(reported))
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
