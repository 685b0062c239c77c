package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.TxLog

object StreamMergeSinkSpec {
  case class Cdc(id: Long, seq: Long, payload: String)
}

/** The CDC current-state sink: a stream of keyed upserts through
  * `foreachBatch(TxLog.cdcMergeSink)` maintains exactly the table a
  * batch last-writer-wins snapshot computes, within-batch duplicates
  * resolve by the ordering column, and a checkpoint restart's replayed
  * batch is a no-op (the batchId mark rides in the merge's own commit). */
class StreamMergeSinkSpec extends SparkSpec {
  import spark.implicits._
  import StreamMergeSinkSpec.Cdc

  private def freshZone(): String =
    java.nio.file.Files.createTempDirectory("graft_msink").toString + "/zone"

  private def state(zone: String): Map[Long, (Long, String)] =
    TxLog.read(spark, zone).select($"id", $"seq", $"payload")
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  /** Batch twin: last writer (greatest seq, payload tiebreak) per key. */
  private def lww(rows: Seq[Cdc]): Map[Long, (Long, String)] =
    rows.groupBy(_.id).map { case (id, rs) =>
      id -> { val w = rs.maxBy(r => (r.seq, r.payload)); (w.seq, w.payload) }
    }

  test("stream of upserts == batch LWW snapshot; updates touch, not append") {
    implicit val sq = spark.sqlContext
    val zone = freshZone()
    // seed the zone so the stream merges into existing generations
    TxLog.replace(spark, zone,
      Seq(Cdc(1L, 0L, "seed1"), Cdc(2L, 0L, "seed2")).toDF()
        .repartitionByRange(2, $"id"),
      statsCols = Seq("id"))
    val b1 = Seq(Cdc(1L, 1L, "v1a"), Cdc(3L, 1L, "new3"))
    val b2 = Seq(Cdc(1L, 2L, "v1b"), Cdc(4L, 1L, "new4"),
      // within-batch duplicate for key 4: seq 2 must win
      Cdc(4L, 2L, "new4b"))

    val mem = MemoryStream[Cdc]
    val q = mem.toDF().writeStream
      .foreachBatch(TxLog.cdcMergeSink(zone, "id", "seq"))
      .outputMode("update").start()
    mem.addData(b1); q.processAllAvailable()
    mem.addData(b2); q.processAllAvailable()
    q.stop()

    val expected = lww(Seq(Cdc(1L, 0L, "seed1"), Cdc(2L, 0L, "seed2")) ++ b1 ++ b2)
    assert(state(zone) === expected)
    assert(state(zone)(4L) === ((2L, "new4b")), "within-batch LWW must resolve by seq")
    assert(state(zone)(2L) === ((0L, "seed2")), "untouched key must survive")
  }

  test("restart: the replayed micro-batch is a no-op, state stays exact") {
    val src = java.nio.file.Files.createTempDirectory("msink_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("msink_ckpt").toString
    val zone = freshZone()

    def writeBatch(rows: Seq[Cdc]): Unit =
      rows.toDS().coalesce(1).write.mode("append").json(src)

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Cdc]].schema)
        .json(src)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(TxLog.cdcMergeSink(zone, "id", "seq"))
        .outputMode("update").start()
      q.processAllAvailable(); q.stop()
    }

    writeBatch(Seq(Cdc(1L, 1L, "a"), Cdc(2L, 1L, "b")))
    runOnce()
    val gen1 = TxLog.latest(spark, zone).get.gen
    // restart with NO new data: the engine may replay the last batch —
    // the zone must not advance or change
    runOnce()
    assert(TxLog.latest(spark, zone).get.gen === gen1, "replayed batch committed twice")
    assert(state(zone) === Map(1L -> ((1L, "a")), 2L -> ((1L, "b"))))
    // new data after the restart still lands
    writeBatch(Seq(Cdc(2L, 2L, "b2"), Cdc(3L, 1L, "c")))
    runOnce()
    assert(state(zone) === Map(1L -> ((1L, "a")), 2L -> ((2L, "b2")), 3L -> ((1L, "c"))))
  }
}
