package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamExpectations

/** Streaming data-quality gate: the windowed violation report must
  * equal the batch Expectations math on the same rows, and the
  * quarantine gate must name exactly the failed checks per row with
  * zero state. */
class StreamExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val checks = Seq(
    "value.in_0_500" -> !col("value").between(0, 500),
    "type.known" -> !col("event_type").isin("signup", "purchase", "view",
      "error", "click"))

  test("windowed report: stream equals batch on the events fixture plus poison rows") {
    implicit val sq = spark.sqlContext
    val good = graft.sources.Tables.events(spark, sf0001)
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventRow].collect().toSeq
    val poison = Seq(
      EventRow(good.head.ts, 9999L, "bogus", 1e9),
      EventRow(good.head.ts, 9998L, "view", -3.0))
    val rows = good ++ poison

    val mem = MemoryStream[EventRow]
    mem.addData(rows)
    val q = StreamExpectations.windowedReport(mem.toDF(), "ts", checks, "1 hour")
      .writeStream.format("memory").queryName("seq_report")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("seq_report")
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm").as("w"),
        col("check"), col("n_checked"), col("n_violations"))
      .as[(String, String, Long, Long)].collect().toSet

    val batch = rows.toDF()
      .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(checks(0)._2, 1L).otherwise(0L)).cast("long").as("v0"),
        sum(when(checks(1)._2, 1L).otherwise(0L)).cast("long").as("v1"))
      .select(date_format(col("ws"), "yyyy-MM-dd HH:mm").as("w"),
        col("n"), col("v0"), col("v1"))
      .as[(String, Long, Long, Long)].collect()
      .flatMap { case (w, n, v0, v1) =>
        Seq((w, checks(0)._1, n, v0), (w, checks(1)._1, n, v1))
      }.toSet
    assert(streamed === batch)
    // the poison rows are the only violations: row one fails BOTH
    // checks, row two fails the range check
    assert(streamed.toSeq.map(_._4).sum === 3L)
  }

  test("gate: failed-check names per row, stateless, clean rows pass") {
    implicit val sq = spark.sqlContext
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val mem = MemoryStream[EventRow]
    mem.addData(Seq(
      EventRow(ts, 1L, "view", 10.0),       // clean
      EventRow(ts, 2L, "bogus", 10.0),      // bad type
      EventRow(ts, 3L, "bogus", -1.0)))     // bad type AND range
    val q = StreamExpectations.gate(mem.toDF(), checks)
      .writeStream.format("memory").queryName("seq_gate")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("seq_gate")
      .select(col("user_id"), col("violations"), col("passed"))
      .as[(Long, Seq[String], Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2.isEmpty && out(1L)._3)
    assert(out(2L)._2 === Seq("type.known") && !out(2L)._3)
    assert(out(3L)._2.toSet === Set("value.in_0_500", "type.known") && !out(3L)._3)
  }
}
