package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Encoders}
import graft.streaming.StatefulSnapshot
import graft.streaming.StatefulSnapshot.SnapshotRow

/** Dev drive: StatefulSnapshot through a checkpointed file-source stream,
  * including state recovery across a full stop/restart. */
object SnapshotDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = Files.createTempDirectory("snapdemo").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(in))

    def put(name: String, rows: String*): Unit =
      Files.write(Paths.get(in, name), rows.mkString("\n").getBytes)

    def runOnce(): Unit = {
      val src = spark.readStream
        .schema(Encoders.product[SnapshotRow].schema)
        .json(in).as[SnapshotRow]
      val q = StatefulSnapshot.updates(src)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[SnapshotRow], _: Long) =>
          b.write.mode("append").parquet(out); ()
        }
        .start()
      q.awaitTermination()
    }

    // run 1: key (1,a) reaches MODIFY@200
    put("f1.json",
      """{"id":"1","name":"a","event":"INSERT","eventMicros":100,"seq":1,"attrsJson":"{\"v\":\"x\"}"}""",
      """{"id":"1","name":"a","event":"MODIFY","eventMicros":200,"seq":2,"attrsJson":"{\"v\":\"y\"}"}""",
      """{"id":"2","name":"b","event":"INSERT","eventMicros":150,"seq":3,"attrsJson":"{\"v\":\"z\"}"}""")
    runOnce()
    println("after run 1:")
    spark.read.parquet(out).orderBy("id", "seq").show(false)

    // run 2 (FRESH query instance, same checkpoint): a STALE event for (1,a)
    // older than the recovered state must NOT win; (2,b) gets tombstoned
    put("f2.json",
      """{"id":"1","name":"a","event":"MODIFY","eventMicros":120,"seq":4,"attrsJson":"{\"v\":\"stale\"}"}""",
      """{"id":"2","name":"b","event":"REMOVE","eventMicros":400,"seq":5,"attrsJson":"{\"v\":\"z\"}"}""",
      """{"id":"3","name":"c","event":"INSERT","eventMicros":50,"seq":6,"attrsJson":"{\"v\":\"q\"}"}""")
    runOnce()
    println("after run 2 (emitted updates; (1,a) must still be v=y from recovered state):")
    spark.read.parquet(out).orderBy("id", "seq").show(false)

    val live = spark.read.parquet(out).as[SnapshotRow].collect()
      .groupBy(r => (r.id, r.name))
      .map { case (_, rs) => rs.maxBy(r => (r.eventMicros, r.seq)) }
      .filter(_.event != "REMOVE")
      .toSeq.sortBy(_.id)
    println("live snapshot: " + live.map(r => s"(${r.id},${r.name},${r.attrsJson})").mkString(" "))
    spark.stop()
  }
}
