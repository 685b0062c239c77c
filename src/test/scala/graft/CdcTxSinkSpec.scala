package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.TxLog
import graft.streaming.CdcStream

/** The transactional dual sink (round-8 directive #7): ok and error
  * routes of a CDC micro-batch commit in ONE TxLog generation — no
  * crash window where one zone's half of a batch is visible without the
  * other's — a replayed batchId is a no-op, and route-pure files let a
  * single-route reader skip the other route's data entirely. */
class CdcTxSinkSpec extends SparkSpec {

  private def parsedFixture() = {
    val fixture = Queries.cdcFixture(spark, sf0001)
    val lines = fixture.select(to_json(struct(
      col("eventName"),
      struct(
        col("_ingest_ts").cast("double").as("ApproximateCreationDateTime"),
        col("dynamodb.Keys").as("Keys"),
        col("dynamodb.NewImage").as("NewImage"),
        col("dynamodb.OldImage").as("OldImage")).as("dynamodb"))).as("value"))
    graft.operators.Cdc.parse(lines, "value")
  }

  test("ok + error routes land in one atomic generation; replay is a no-op") {
    val zone = Files.createTempDirectory("graft_cdctx").toString + "/zone"
    val batch = parsedFixture()

    CdcStream.commitBatchTx(zone)(batch, batchId = 0L)
    val gen0 = TxLog.latest(spark, zone).get.gen
    val all = TxLog.read(spark, zone)
    val okN = all.filter(col("route") === "ok").count()
    val errN = all.filter(col("route") === "err").count()
    assert(okN > 0L && errN > 0L,
      s"fixture must produce both routes (ok=$okN err=$errN)")
    // both routes committed by the SAME generation — atomic by construction,
    // and the zone's whole history is that one commit
    assert(TxLog.history(spark, zone).count() === gen0 + 1)

    // the error payload is the split's reason-keyed rows, all of them
    val clicks = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_type") === "click").count()
    assert(errN === clicks, "every invalid envelope routed, none dropped")
    assert(all.filter(col("route") === "err")
      .filter(col("error_reason").startsWith("unknown_event")).count() === errN)

    // replayed batch: exactlyOnceAppend skips — no new generation, no dupes
    CdcStream.commitBatchTx(zone)(batch, batchId = 0L)
    assert(TxLog.latest(spark, zone).get.gen === gen0, "replay must be a no-op")
    assert(TxLog.read(spark, zone).count() === okN + errN)

    // a LATER batch appends one more atomic generation
    CdcStream.commitBatchTx(zone)(batch, batchId = 1L)
    assert(TxLog.latest(spark, zone).get.gen === gen0 + 1)
    assert(TxLog.read(spark, zone).count() === 2 * (okN + errN))
  }

  test("route rides in statsCols: a single-route read opens only its files") {
    val zone = Files.createTempDirectory("graft_cdctx2").toString + "/zone"
    CdcStream.commitBatchTx(zone)(parsedFixture(), batchId = 0L)
    val head = TxLog.latest(spark, zone).get
    // files are route-pure (repartition(route) before the write), so the
    // stats-pruned err read must open strictly fewer files than the zone
    val errFiles = TxLog.prunedFilesFor(head, "route", "err", "err")
    assert(errFiles.nonEmpty && errFiles.size < head.files.size,
      s"err read must prune ok files: ${errFiles.size}/${head.files.size}")
    val errRows = TxLog.readWhereCol(spark, zone, "route", "err", "err")
    assert(errRows.count() ===
      TxLog.read(spark, zone).filter(col("route") === "err").count())
  }
}
