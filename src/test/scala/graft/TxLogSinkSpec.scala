package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.TxLog

/** `writeStream.format("txlog")` — the lake SINK behind the shared short
  * name (see [[graft.sources.TxLogStreamProvider.createSink]]): plain
  * writer-API streaming into a transactional zone, exactly-once by the
  * in-manifest batchId mark, with merge and complete-replace variants.
  * Every test checks zone CONTENT through the normal read path, so the
  * sink must produce logs indistinguishable from the foreachBatch
  * sinks'. */
class TxLogSinkSpec extends SparkSpec {
  import spark.implicits._
  implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def freshZone(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/zone"

  private def chk(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix + "_chk").toString

  test("append sink: a stream lands exactly-once generations in a FRESH zone") {
    val zone = freshZone("graft_sink_app")
    val mem = MemoryStream[Long]
    mem.addData(0L until 5L: _*)
    val q = mem.toDF().toDF("k")
      .writeStream.format("txlog").option("zone", zone)
      .option("statsCols", "k")
      .option("checkpointLocation", chk("graft_sink_app"))
      .outputMode("append").start()
    q.processAllAvailable()
    mem.addData(5L until 10L: _*)
    q.processAllAvailable(); q.stop()
    assert(TxLog.read(spark, zone).as[Long].collect().toSet ===
      (0L until 10L).toSet, "both micro-batches must land once each")
    val head = TxLog.latest(spark, zone).get
    assert(head.meta.get("batchId").isDefined,
      "the high-water mark must ride in the manifest")
    // the statsCols option flowed through: a pruned read works
    assert(TxLog.metadataCount(spark, zone) === Some(10L))
  }

  test("a replayed batchId is a no-op (restart semantics, unit form)") {
    val zone = freshZone("graft_sink_replay")
    val provider = new graft.sources.TxLogStreamProvider
    val sink = provider.createSink(spark.sqlContext,
      Map("zone" -> zone), Nil,
      org.apache.spark.sql.streaming.OutputMode.Append())
    val df = spark.range(3L).toDF("k")
    sink.addBatch(0L, df)
    sink.addBatch(0L, df) // the restart replay
    sink.addBatch(1L, spark.range(3L, 6L).toDF("k"))
    assert(TxLog.read(spark, zone).as[Long].collect().toSet ===
      (0L until 6L).toSet, "batch 0 must commit exactly once")
  }

  test("mergeKey + ordCol: a CDC stream maintains the current state") {
    val zone = freshZone("graft_sink_merge")
    // seed: keys 0..4 at version 0
    TxLog.replace(spark, zone,
      Seq.tabulate(5)(k => (k.toLong, 0L, s"v0-$k")).toDF("k", "ver", "payload"))
    val mem = MemoryStream[(Long, Long, String)]
    // batch: keys 1,3 updated twice IN the batch (LWW must keep ver 2),
    // key 7 inserted
    mem.addData((1L, 1L, "v1-1"), (1L, 2L, "v2-1"), (3L, 2L, "v2-3"),
      (7L, 1L, "v1-7"))
    val q = mem.toDF().toDF("k", "ver", "payload")
      .writeStream.format("txlog").option("zone", zone)
      .option("mergeKey", "k").option("ordCol", "ver")
      .option("checkpointLocation", chk("graft_sink_merge"))
      .outputMode("update").start()
    q.processAllAvailable(); q.stop()
    val got = TxLog.read(spark, zone).as[(Long, Long, String)]
      .collect().toSet
    val expect = Set(
      (0L, 0L, "v0-0"), (1L, 2L, "v2-1"), (2L, 0L, "v0-2"),
      (3L, 2L, "v2-3"), (4L, 0L, "v0-4"), (7L, 1L, "v1-7"))
    assert(got === expect,
      "merge sink must upsert per-key last-writer-wins rows")
  }

  test("complete mode: a streaming aggregate becomes a continuously-replaced zone") {
    val zone = freshZone("graft_sink_complete")
    val mem = MemoryStream[Long]
    mem.addData(1L, 2L, 3L)
    val q = mem.toDF().toDF("k")
      .groupBy((col("k") % 2).as("parity")).agg(count(lit(1)).as("n"))
      .writeStream.format("txlog").option("zone", zone)
      .option("checkpointLocation", chk("graft_sink_complete"))
      .outputMode("complete").start()
    q.processAllAvailable()
    mem.addData(4L, 5L, 6L)
    q.processAllAvailable(); q.stop()
    // the zone holds ONLY the latest full aggregate — replaced, not appended
    assert(TxLog.read(spark, zone).as[(Long, Long)].collect().toSet ===
      Set((0L, 3L), (1L, 3L)),
      "complete mode must replace the zone with the latest result")
  }

  test("option validation refuses bad combinations loudly") {
    val provider = new graft.sources.TxLogStreamProvider
    val am = org.apache.spark.sql.streaming.OutputMode.Append()
    intercept[IllegalArgumentException] {
      provider.createSink(spark.sqlContext, Map.empty, Nil, am)
    }
    intercept[IllegalArgumentException] { // ordCol without mergeKey
      provider.createSink(spark.sqlContext,
        Map("zone" -> "/tmp/x", "ordCol" -> "v"), Nil, am)
    }
    intercept[IllegalArgumentException] { // complete + mergeKey
      provider.createSink(spark.sqlContext,
        Map("zone" -> "/tmp/x", "mergeKey" -> "k"), Nil,
        org.apache.spark.sql.streaming.OutputMode.Complete())
    }
    intercept[IllegalArgumentException] { // partitionBy
      provider.createSink(spark.sqlContext,
        Map("zone" -> "/tmp/x"), Seq("p"), am)
    }
    intercept[IllegalArgumentException] { // Update mode without mergeKey:
      // re-emitted changed rows appended per trigger would silently
      // accumulate stale rows per key
      provider.createSink(spark.sqlContext,
        Map("zone" -> "/tmp/x"), Nil,
        org.apache.spark.sql.streaming.OutputMode.Update())
    }
  }
}
