package graft

import org.apache.spark.sql.functions._
import graft.operators.{FullLoad, TxLog}
import graft.sources.{DynamoFake, ShardCdcSource, ShardStore}

/** The WHOLE reference architecture, emulated end-to-end in-sandbox:
  *
  *   DynamoDB table  --Scan(Segment/Total, throttled)-->  full-load zone
  *        |                                                     |
  *        +--CDC envelopes--> Kinesis-shaped shards --stream--> |
  *                                                              v
  *                                        TxLog current-state zone (merge)
  *
  * i.e. `ddb_full_load.py` (protocol-paged segmented scan) lands the
  * base state, `stack.ts:59-64` (shard transport, per-shard ordering)
  * carries the change stream, and the exactly-once merge sink maintains
  * the current-state table the reference rebuilds by full-scan
  * compaction. One spec, every seam real: paging, routing, cursors,
  * checkpoint restart, LWW upsert. */
class ReferenceStackSpec extends SparkSpec {
  import spark.implicits._

  private def envelope(event: String, id: Long, payload: String, seq: Long): String =
    s"""{"eventName":"$event","dynamodb":{"ApproximateCreationDateTime":${1687310000 + seq}.0,""" +
      s""""Keys":{"id":{"N":"$id"}},""" +
      s""""NewImage":{"id":{"N":"$id"},"payload":{"S":"$payload"},"seq":{"N":"$seq"}}}}"""

  test("full load + shard CDC stream + merge sink reproduce the reference's current state") {
    val base = java.nio.file.Files.createTempDirectory("graft_stack").toString
    val loadDest = s"$base/full_load"
    val stateZone = s"$base/state"
    val shardDir = s"$base/shards"
    val ckpt = s"$base/ckpt"

    // 1) FULL LOAD: the protocol-paged, throttle-shaped segmented scan
    //    (unthrottled budget here; pacing has its own spec) lands the
    //    base table exactly once
    val table = DynamoFake.FakeDynamoTable(totalRows = 300L, pageItems = 64)
    FullLoad.runScan(spark,
      DynamoFake.ThrottledDynamoScan(table, provisionedRcu = 1e9),
      splits = 4, destPath = loadDest, outputPartitions = 2)
    val loaded = FullLoad.readBack(spark, loadDest)
    assert(loaded.count() === 300L)

    // 2) the base state becomes the current-state zone at seq 0
    TxLog.replace(spark, stateZone,
      loaded.select(col("id"), col("payload"), lit(0L).as("seq")),
      statsCols = Seq("id"))

    // 3) CDC: changes ride the shard transport routed by item key — the
    //    per-shard (hence per-key) ordering guarantee the merge sink's
    //    across-batch assumption rests on
    val st = new ShardStore(shardDir)
    st.createStream(4)
    // modify ids 0..49 twice (only the second write may survive),
    // insert new ids 300..319
    for (id <- 0L until 50L) st.put(id.toString, envelope("MODIFY", id, s"v1-$id", 1L))
    for (id <- 0L until 50L) st.put(id.toString, envelope("MODIFY", id, s"v2-$id", 2L))
    for (id <- 300L until 320L) st.put(id.toString, envelope("INSERT", id, s"new-$id", 1L))

    def runOnce(): Unit = {
      val parsed = ShardCdcSource(shardDir).stream(spark)
      val img = org.apache.spark.sql.functions.col("dynamodb.NewImage")
      val flat = parsed
        .filter(col("_corrupt_record").isNull && col("eventName").isin("INSERT", "MODIFY"))
        .select(
          element_at(element_at(img, "id"), "N").cast("long").as("id"),
          element_at(element_at(img, "payload"), "S").as("payload"),
          element_at(element_at(img, "seq"), "N").cast("long").as("seq"))
      val q = flat.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(TxLog.cdcMergeSink(stateZone, "id", "seq"))
        .outputMode("update").start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()

    val state1 = TxLog.read(spark, stateZone)
      .select($"id", $"payload", $"seq").as[(Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(state1.size === 320, "300 base + 20 inserted keys")
    for (id <- 0L until 50L)
      assert(state1(id) === ((s"v2-$id", 2L)), s"id $id must hold the LAST cdc image")
    for (id <- 50L until 300L)
      assert(state1(id) === ((s"p$id", 0L)), s"untouched id $id must keep the full-load row")
    for (id <- 300L until 320L)
      assert(state1(id) === ((s"new-$id", 1L)), s"inserted id $id missing")

    // 4) RESTART: more changes arrive; the checkpointed cursors resume
    //    and the batchId-in-commit mark keeps the sink exactly-once
    for (id <- 40L until 60L) st.put(id.toString, envelope("MODIFY", id, s"v3-$id", 3L))
    runOnce()
    runOnce() // an idle extra run must change nothing
    val state2 = TxLog.read(spark, stateZone)
      .select($"id", $"payload", $"seq").as[(Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(state2.size === 320)
    for (id <- 40L until 60L)
      assert(state2(id) === ((s"v3-$id", 3L)), s"id $id must advance to seq 3")
    for (id <- 0L until 40L)
      assert(state2(id) === ((s"v2-$id", 2L)), s"id $id must be untouched by round 2")
    // the merge path stayed pruned: the zone still tracks id stats and
    // serves metadata-only counts (no stats lost through the merges)
    assert(TxLog.metadataCount(spark, stateZone) === Some(320L))

    // 5) MONITORING CONSUMER with pushdown (round 9): a second reader of
    //    the SAME shard transport watching one shard only — the query-
    //    plan filter reaches the source, so the consumer never opens the
    //    other three shards' record files (the Kinesis per-shard worker
    //    shape), and its rows equal the transport's ground truth
    val watched = st.shards().map(s => s.id -> st.maxSeq(s.id))
      .filter(_._2 > 0L).maxBy(_._2)._1
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String)]
    val mon = spark.readStream.format("shardstore").option("dir", shardDir).load()
      .filter(col("shard") === watched)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.as[(String, Long, String)].collect() }: Unit
      }.start()
    mon.processAllAvailable(); mon.stop()
    val (served, total) = graft.plans.PushdownProbe.get(s"shardstore:$shardDir").get
    assert(served < total, s"the one-shard consumer must not read the rest: $served/$total")
    assert(seen.map(_._2).toSet === st.get(watched, 0L).map(_._1).toSet,
      "the watched shard's records, exactly")
  }
}
