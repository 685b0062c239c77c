package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{CdcStream, StreamOps}

/** Top-level for Encoder derivation. */
case class EventRow(ts: java.sql.Timestamp, user_id: Long, event_type: String, value: Double)

/** Streaming validation (SURVEY.md §5.2 item 4): stream-vs-batch
  * equivalence, exactly-once incremental processing across restarts,
  * watermark late-data semantics. */
class StreamingSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes)

  private val insert =
    """{"eventName":"INSERT","dynamodb":{"ApproximateCreationDateTime":1687310602.0,"Keys":{"id":{"S":"1"},"name":{"S":"a"}},"NewImage":{"id":{"S":"1"},"name":{"S":"a"},"v":{"S":"x"}}}}"""
  private val modify =
    """{"eventName":"MODIFY","dynamodb":{"ApproximateCreationDateTime":1687310662.0,"Keys":{"id":{"S":"1"},"name":{"S":"a"}},"NewImage":{"id":{"S":"1"},"name":{"S":"a"},"v":{"S":"y"}}}}"""
  private val badEvent =
    """{"eventName":"UPSERT","dynamodb":{"ApproximateCreationDateTime":1687310700.0,"Keys":{},"NewImage":{}}}"""

  test("CDC stream: incremental exactly-once across two runs + error routing") {
    val in = tmp("cdcin"); val lake = tmp("lake") + "/z"; val err = tmp("err") + "/e"
    val ckpt = tmp("ckpt")
    writeLines(in, "f1.json", Seq(insert))
    CdcStream.runAvailableNow(spark, in, lake, err, ckpt)
    assert(spark.read.json(s"$lake/year=*/month=*/day=*/hour=*").count() === 1)

    // second run with MORE input and the SAME checkpoint: only the new
    // file is processed (no duplicates of f1), the bad row routes to error
    writeLines(in, "f2.json", Seq(modify, badEvent))
    CdcStream.runAvailableNow(spark, in, lake, err, ckpt)
    val ok = spark.read.json(s"$lake/year=*/month=*/day=*/hour=*")
    assert(ok.count() === 2) // 1 + 1, not 1 + 2
    val errRows = spark.read.json(err) // root: partition discovery keeps batch_id/error_reason
    assert(errRows.count() === 1)

    // third run with nothing new: a no-op
    CdcStream.runAvailableNow(spark, in, lake, err, ckpt)
    assert(spark.read.json(s"$lake/year=*/month=*/day=*/hour=*").count() === 2)
  }

  test("streaming tumbling agg == batch groupBy(window) on the same rows") {
    import spark.implicits._
    val rows = graft.sources.Tables.events(spark, sf0001)
      .select($"ts", $"user_id", $"event_type", $"value")
      .as[EventRow].collect().toSeq

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventRow]
    mem.addData(rows)
    val q = StreamOps.tumblingAgg(mem.toDF(), "ts", "event_type", "value")
      .writeStream.format("memory").queryName("tumb").outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("tumb")
      .select(date_format($"window_start", "yyyy-MM-dd HH:mm:ss").as("ws"),
        $"event_type", $"cnt", round($"sum_value", 4).as("sv"))
      .orderBy("ws", "event_type").collect()
    val batch = graft.sources.Tables.events(spark, sf0001)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("cnt"),
        round(sum($"value".cast("decimal(18,4)")).cast("double"), 4).as("sv"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("ws"),
        $"event_type", $"cnt", $"sv")
      .orderBy("ws", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("dropDuplicatesWithinWatermark removes at-least-once redeliveries") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val mem = MemoryStream[EventRow]
    mem.addData(Seq(
      EventRow(t0, 1L, "a", 1.0),
      EventRow(t0, 1L, "a", 1.0), // duplicate delivery
      EventRow(t0, 2L, "b", 2.0)))
    val q = StreamOps.dedupeWithinWatermark(mem.toDF(), "ts", Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup").count() === 2)
  }

  test("late data beyond the watermark is dropped (append mode)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = MemoryStream[EventRow]
    val q = StreamOps.tumblingAgg(mem.toDF(), "ts", "event_type", "value",
        windowLen = "1 hour", lateness = "10 minutes")
      .writeStream.format("memory").queryName("late").outputMode("append").start()

    // batch 1: two rows in [10:00,11:00) plus one at 13:00 that will push
    // the watermark to 12:50, far past the first window's end
    mem.addData(Seq(
      EventRow(ts("2024-01-01 10:01:00"), 1L, "a", 1.0),
      EventRow(ts("2024-01-01 10:02:00"), 2L, "a", 1.0),
      EventRow(ts("2024-01-01 13:00:00"), 3L, "a", 1.0)))
    q.processAllAvailable()
    // batch 2: a LATE row for the closed 10:00 window -> must be dropped
    mem.addData(Seq(EventRow(ts("2024-01-01 10:03:00"), 4L, "a", 1.0)))
    q.processAllAvailable()
    // batch 3: advance watermark further so closable windows flush
    mem.addData(Seq(EventRow(ts("2024-01-01 15:00:00"), 5L, "a", 1.0)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("late")
      .select(date_format($"window_start", "HH:mm").as("w"), $"cnt")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("10:00") === 2) // late row NOT counted
  }
}

/** Stateful snapshot equivalence: streaming mapGroupsWithState vs batch
  * max_by snapshot over the same event history, fed in multiple batches. */
class StatefulSnapshotSpec extends SparkSpec {
  import graft.streaming.StatefulSnapshot
  import graft.streaming.StatefulSnapshot.SnapshotRow

  test("incremental snapshot == batch snapshot after all batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val batch1 = Seq(
      SnapshotRow("1", "a", "INSERT", 100L, 1L, """{"v":"x"}"""),
      SnapshotRow("1", "a", "MODIFY", 200L, 2L, """{"v":"y"}"""),
      SnapshotRow("2", "b", "INSERT", 150L, 3L, """{"v":"z"}"""))
    val batch2 = Seq(
      SnapshotRow("1", "a", "MODIFY", 300L, 4L, """{"v":"w"}"""),
      SnapshotRow("2", "b", "REMOVE", 400L, 5L, """{"v":"z"}"""),
      SnapshotRow("3", "c", "INSERT", 50L, 6L, """{"v":"q"}"""),
      // late event OLDER than key 1's current state: must not win
      SnapshotRow("1", "a", "MODIFY", 120L, 7L, """{"v":"stale"}"""))

    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SnapshotRow]
    val q = StatefulSnapshot.updates(mem.toDS())
      .writeStream.format("memory").queryName("snapstate").outputMode("update").start()
    mem.addData(batch1); q.processAllAvailable()
    mem.addData(batch2); q.processAllAvailable()
    q.stop()

    // streaming result: per key, the row emitted with the highest (ts,seq)
    val streamed = spark.table("snapstate").as[SnapshotRow].collect()
      .groupBy(r => (r.id, r.name))
      .map { case (_, rs) => rs.maxBy(r => (r.eventMicros, r.seq)) }
      .filter(_.event != "REMOVE")
      .map(r => (r.id, r.name, r.attrsJson)).toSet

    // batch result over the full history via the batch operator
    val all = (batch1 ++ batch2).toDF()
      .withColumn(
        "ingestion_timestamp",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.col("eventMicros")))
    val batched = graft.operators.Cdc.snapshot(
        all, Seq("id", "name"), Seq("ingestion_timestamp", "seq"), eventCol = "event")
      .collect()
      .map(r => (r.getAs[String]("id"), r.getAs[String]("name"), r.getAs[String]("attrsJson")))
      .toSet

    assert(streamed === batched)
    assert(streamed === Set(("1", "a", """{"v":"w"}"""), ("3", "c", """{"v":"q"}""")))
  }
}

/** Sliding and session window streaming ops vs their batch equivalents. */
class WindowOpsSpec extends SparkSpec {
  import graft.streaming.StreamOps

  test("sliding window agg == batch groupBy(window, slide)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val rows = graft.sources.Tables.events(spark, sf0001)
      .select($"ts", $"user_id", $"event_type", $"value").as[EventRow].collect().toSeq
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
    mem.addData(rows)
    val q = StreamOps.slidingAgg(mem.toDF(), "ts", "event_type", "1 hour", "30 minutes")
      .writeStream.format("memory").queryName("slide").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("slide")
      .select(date_format($"window_start", "yyyy-MM-dd HH:mm").as("ws"), $"event_type", $"cnt")
      .orderBy("ws", "event_type").collect()
    val batch = graft.sources.Tables.events(spark, sf0001)
      .groupBy(window($"ts", "1 hour", "30 minutes"), $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm").as("ws"), $"event_type", $"cnt")
      .orderBy("ws", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("session window groups events within the gap") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
    mem.addData(Seq(
      EventRow(ts("2024-01-01 10:00:00"), 1L, "a", 1.0),
      EventRow(ts("2024-01-01 10:10:00"), 2L, "a", 1.0),  // same session (gap 30m)
      EventRow(ts("2024-01-01 12:00:00"), 3L, "a", 1.0))) // new session
    val q = StreamOps.sessionAgg(mem.toDF(), "ts", "event_type", gap = "30 minutes")
      .writeStream.format("memory").queryName("sess").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("sess").orderBy("session_start").collect()
    assert(out.length === 2)
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 1L))
  }
}
