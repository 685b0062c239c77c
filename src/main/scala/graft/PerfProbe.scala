package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Dev-only: isolate where q36/q37 time goes at sf0.1. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    val docs = Tables.documents(spark, d)
    val withSh = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), TextAnalysis.shingles(col("toks"), 3).as("sh"))
    val sigs = withSh.select(col("doc_id"), Dedup.minhashSignature(col("sh"), 32).as("sig"))

    time("sigs only") { sigs.count() }
    val bandKeys = array((0 until 16).map { b =>
      concat_ws("|", (lit(b) +: (0 until 2).map(r =>
        element_at(col("sig"), b * 2 + r + 1))): _*)
    }: _*)
    val banded = sigs.select(col("doc_id"), explode(bandKeys).as("bk"))
    val plan = banded.queryExecution.optimizedPlan.toString
    println("banded plan: md5 occurrences=" + "md5".r.findAllIn(plan).length +
      ", length=" + plan.length)
    time("banded explode only") { banded.count() }
    time("lsh candidates") { Dedup.lshCandidates(sigs, "doc_id", "sig", 16, 2).count() }
    time("q37 full") { Dedup.minhashNearDups(docs, "doc_id", "text").count() }
    time("q36 full") { Dedup.jaccardPairs(docs, "doc_id", "text").count() }
    spark.stop()
  }
}
