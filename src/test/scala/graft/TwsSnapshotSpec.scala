package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{StatefulSnapshot, TwsSnapshot}
import graft.streaming.StatefulSnapshot.SnapshotRow

/** transformWithState (StatefulProcessor + RocksDB store) snapshot ==
  * mapGroupsWithState snapshot == batch snapshot, on the same LWW
  * fixture including a stale late event and a tombstone. */
class TwsSnapshotSpec extends SparkSpec {

  private val batch1 = Seq(
    SnapshotRow("1", "a", "INSERT", 100L, 1L, """{"v":"x"}"""),
    SnapshotRow("1", "a", "MODIFY", 200L, 2L, """{"v":"y"}"""),
    SnapshotRow("2", "b", "INSERT", 150L, 3L, """{"v":"z"}"""))
  private val batch2 = Seq(
    SnapshotRow("1", "a", "MODIFY", 300L, 4L, """{"v":"w"}"""),
    SnapshotRow("2", "b", "REMOVE", 400L, 5L, """{"v":"z"}"""),
    SnapshotRow("3", "c", "INSERT", 50L, 6L, """{"v":"q"}"""),
    SnapshotRow("1", "a", "MODIFY", 120L, 7L, """{"v":"stale"}"""))

  private def withRocksDb[T](body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState snapshot == mapGroupsWithState == batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext

    val tws = withRocksDb {
      val mem = MemoryStream[SnapshotRow]
      val q = TwsSnapshot.updates(mem.toDS())
        .writeStream.format("memory").queryName("twssnap").outputMode("update").start()
      mem.addData(batch1); q.processAllAvailable()
      mem.addData(batch2); q.processAllAvailable()
      q.stop()
      spark.table("twssnap").as[SnapshotRow].collect()
    }
    def finalPerKey(rows: Array[SnapshotRow]): Set[(String, String, String)] =
      rows.groupBy(r => (r.id, r.name))
        .map { case (_, rs) => rs.maxBy(r => (r.eventMicros, r.seq)) }
        .filter(_.event != "REMOVE")
        .map(r => (r.id, r.name, r.attrsJson)).toSet

    val mem2 = MemoryStream[SnapshotRow]
    val q2 = StatefulSnapshot.updates(mem2.toDS())
      .writeStream.format("memory").queryName("mgwssnap").outputMode("update").start()
    mem2.addData(batch1); q2.processAllAvailable()
    mem2.addData(batch2); q2.processAllAvailable()
    q2.stop()
    val mgws = spark.table("mgwssnap").as[SnapshotRow].collect()

    assert(finalPerKey(tws) === finalPerKey(mgws))
    assert(finalPerKey(tws) ===
      Set(("1", "a", """{"v":"w"}"""), ("3", "c", """{"v":"q"}""")))
  }

  test("transformWithState snapshot survives a checkpoint restart") {
    import spark.implicits._
    // file source + foreachBatch sink: the memory sink refuses checkpoint
    // recovery, so the restart path needs recoverable endpoints
    withRocksDb {
      val src = java.nio.file.Files.createTempDirectory("twssrc").toString
      val ckpt = java.nio.file.Files.createTempDirectory("twsckpt").toString
      val out = java.nio.file.Files.createTempDirectory("twsout").toString + "/t"

      def writeBatch(rows: Seq[SnapshotRow]): Unit =
        rows.toDS().coalesce(1).write.mode("append").json(src)

      def runOnce(): Unit = {
        val stream = spark.readStream
          .schema(implicitly[org.apache.spark.sql.Encoder[SnapshotRow]].schema)
          .json(src).as[SnapshotRow]
        val q = TwsSnapshot.updates(stream)
          .writeStream.outputMode("update")
          .foreachBatch { (ds: org.apache.spark.sql.Dataset[SnapshotRow], _: Long) =>
            ds.write.mode("append").parquet(out): Unit
          }
          .option("checkpointLocation", ckpt).start()
        q.processAllAvailable(); q.stop()
      }

      writeBatch(batch1); runOnce()
      writeBatch(batch2); runOnce() // full restart from checkpoint

      val rows = spark.read.parquet(out).as[SnapshotRow].collect()
        .groupBy(r => (r.id, r.name))
        .map { case (_, rs) => rs.maxBy(r => (r.eventMicros, r.seq)) }
        .filter(_.event != "REMOVE")
        .map(r => (r.id, r.name, r.attrsJson)).toSet
      // key 1's state (ts 200/300) lives only in the pre-restart store:
      // the post-restart stale ts-120 row must still lose to it
      assert(rows ===
        Set(("1", "a", """{"v":"w"}"""), ("3", "c", """{"v":"q"}""")))
    }
  }
}
