package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.TxLog
import graft.plans.PushdownProbe

/** `spark.readStream.table("graft.ns.t")` — catalog tables stream
  * natively through [[graft.sources.TxLogMicroBatchStream]] (the v2 twin
  * of the v1 `readStream.format("txlog")` source, which keeps its own
  * pinned option surface — TxLogBatchTableSpec asserts the format path
  * still takes v1). Contract: full snapshot first, then per-commit
  * diffs, exactly-once across restarts, filters pruning every batch. */
class TxLogStreamTableSpec extends SparkSpec {
  import spark.implicits._

  private val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stbl").toString
    spark.conf.set("spark.sql.catalog.gstbl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gstbl.warehouse", dir)
    dir
  }

  private var n = 0
  private def fresh(): String = { n += 1; s"gstbl.s.t$n" }
  private def zoneOf(t: String): String =
    wh + "/" + t.stripPrefix("gstbl.").replace('.', '/')

  private def drive(t: String, f: DataFrame => DataFrame = identity,
                    ckpt: Option[String] = None): Set[Long] = {
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val w = f(spark.readStream.table(t)).writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.select("k").as[Long].collect() }: Unit
      }
    val q = ckpt.fold(w)(w.option("checkpointLocation", _)).start()
    q.processAllAvailable(); q.stop()
    seen.toSet
  }

  test("readStream.table serves the snapshot, then each commit's diff, exactly once") {
    val t = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT) TBLPROPERTIES ('statsCols'='k')")
    spark.sql(s"INSERT INTO $t SELECT id AS k FROM range(10)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stbl_ck").toString
    assert(drive(t, ckpt = Some(ckpt)) === (0L until 10L).toSet,
      "the first run serves the full snapshot")
    spark.sql(s"INSERT INTO $t SELECT id + 100 AS k FROM range(5)")
    assert(drive(t, ckpt = Some(ckpt)) === (100L until 105L).toSet,
      "a checkpointed restart serves ONLY the new commit's rows")
  }

  test("a filtered streaming read prunes each batch's files by committed stats") {
    val t = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT) TBLPROPERTIES ('statsCols'='k')")
    spark.range(100L).toDF("k").repartitionByRange(4, col("k"))
      .writeTo(t).append()
    PushdownProbe.clear(s"txlog:${zoneOf(t)}")
    val got = drive(t, _.filter(col("k") < 25L))
    assert(got === (0L until 25L).toSet)
    val (served, total) = PushdownProbe.get(s"txlog:${zoneOf(t)}").get
    assert(total === 4L && served < total,
      s"the pushed predicate must file-prune the micro-batch: $served/$total")
  }

  test("a self-union with one filtered branch never prunes the shared stream") {
    val t = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT) TBLPROPERTIES ('statsCols'='k')")
    spark.range(100L).toDF("k").repartitionByRange(4, col("k"))
      .writeTo(t).append()
    PushdownProbe.clear(s"txlog:${zoneOf(t)}")
    // both branches resolve to the SAME stream instance; pruning by the
    // filtered branch's predicate would silently starve the bare branch
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val src = spark.readStream.table(t)
    val q = src.filter(col("k") < 25L).union(src).writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.select("k").as[Long].collect() }: Unit
      }.start()
    q.processAllAvailable(); q.stop()
    assert(seen.size === 125 && seen.toSet === (0L until 100L).toSet,
      "the bare branch must see every row, the filtered one its 25")
    val (served, total) = PushdownProbe.get(s"txlog:${zoneOf(t)}").get
    assert(served === total,
      s"a shared stream with an unfiltered consumer must not prune: $served/$total")
  }

  test("startingGen / maxGensPerBatch options mirror the v1 source's contract") {
    val t = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (1)")
    val g1 = TxLog.latest(spark, zoneOf(t)).get.gen
    spark.sql(s"INSERT INTO $t VALUES (2)")
    spark.sql(s"INSERT INTO $t VALUES (3)")
    // changes AFTER g1: the snapshot (1) is skipped
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    var batches = 0
    val q = spark.readStream
      .option("startingGen", g1.toString)
      .option("maxGensPerBatch", "1")
      .table(t).writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        val rows = df.select("k").as[Long].collect()
        seen.synchronized { seen ++= rows; if (rows.nonEmpty) batches += 1 }: Unit
      }.start()
    q.processAllAvailable(); q.stop()
    assert(seen.toSet === Set(2L, 3L),
      "startingGen streams only the commits after it")
    assert(batches === 2,
      s"maxGensPerBatch=1 must deliver one commit per batch, got $batches")
  }

  test("default-mode + maxGensPerBatch starts on a vacuumed zone (first offer uncapped)") {
    val t = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    (0 until 6).foreach(i => spark.sql(s"INSERT INTO $t VALUES ($i)"))
    spark.conf.set("spark.graft.vacuum.grace.ms", "0")
    try spark.sql(s"VACUUM $t RETAIN 2 GENERATIONS")
    finally spark.conf.unset("spark.graft.vacuum.grace.ms")
    // capping the FIRST offer against the -1 sentinel would resolve a
    // folded-away generation and wedge the stream before it starts
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.option("maxGensPerBatch", "2").table(t)
      .writeStream.foreachBatch { (df: DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.select("k").as[Long].collect() }: Unit
      }.start()
    q.processAllAvailable(); q.stop()
    assert(seen.toSet === (0L until 6L).toSet,
      "the initial snapshot must arrive whole despite the cap + vacuum")
  }

  test("a rewrite inside the stream window fails loudly (append-only contract)") {
    val t = fresh()
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(10)")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stbl_ck2").toString
    drive(t, ckpt = Some(ckpt)) // consume the snapshot
    spark.sql(s"INSERT OVERWRITE $t SELECT id AS k FROM range(3)")
    val e = intercept[Exception] { drive(t, ckpt = Some(ckpt)) }
    def causes(x: Throwable): Seq[String] =
      if (x == null) Nil else x.getMessage +: causes(x.getCause)
    assert(causes(e).exists(m => m != null && m.contains("rewrote")) ||
      causes(e).exists(m => m != null && m.contains("append")),
      s"a replace inside the window must fail the batch: ${causes(e)}")
  }
}
