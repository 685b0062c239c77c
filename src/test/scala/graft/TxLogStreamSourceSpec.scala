package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import graft.operators.TxLog

/** The TxLog streaming-source contract: initial snapshot then per-
  * generation deltas with no duplicates, checkpoint restart resumes from
  * the committed generation, and a history rewrite inside a batch window
  * fails the stream loudly instead of corrupting the diff. */
class TxLogStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshZone(): String =
    java.nio.file.Files.createTempDirectory("graft_zsrc").toString + "/zone"

  private val fmt = "graft.sources.TxLogStreamProvider"

  test("initial snapshot + appended generations arrive exactly once") {
    val zone = freshZone()
    TxLog.replace(spark, zone, spark.range(10L).toDF("id"))
    val q = spark.readStream.format(fmt).option("zone", zone).load()
      .writeStream.format("memory").queryName("zsrc1").outputMode("append")
      .start()
    q.processAllAvailable()
    assert(spark.table("zsrc1").as[Long].collect().toSet === (0L until 10L).toSet,
      "first batch must serve the initial snapshot")
    TxLog.append(spark, zone, spark.range(10L, 25L).toDF("id"))
    TxLog.append(spark, zone, spark.range(25L, 30L).toDF("id"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("zsrc1").as[Long].collect()
    assert(got.length === 30, s"expected 30 rows exactly once, got ${got.length}")
    assert(got.toSet === (0L until 30L).toSet)
  }

  test("a non-empty start generation streams its snapshot (init over an existing dir)") {
    // the migration path: a plain parquet directory brought under the log
    // — gen 0 itself holds every file, and a file-diff-only source would
    // silently drop the entire initial state (round-7 ADVICE finding)
    val zone = freshZone()
    spark.range(20L).toDF("id").repartition(4).write.parquet(zone)
    TxLog.init(spark, zone)
    assert(TxLog.latest(spark, zone).exists(s => s.gen === 0L && s.files.nonEmpty),
      "fixture: gen 0 must be the non-empty start generation")
    val q = spark.readStream.format(fmt).option("zone", zone).load()
      .writeStream.format("memory").queryName("zsrc_init").outputMode("append")
      .start()
    q.processAllAvailable()
    assert(spark.table("zsrc_init").as[Long].collect().toSet === (0L until 20L).toSet,
      "initial snapshot must include the start generation's own files")
    TxLog.append(spark, zone, spark.range(20L, 26L).toDF("id"))
    q.processAllAvailable(); q.stop()
    assert(spark.table("zsrc_init").as[Long].collect().toSet === (0L until 26L).toSet)
    assert(spark.table("zsrc_init").count() === 26L, "snapshot+delta must not duplicate")
  }

  test("schema evolution mid-stream: the pinned schema holds, new columns wait for a restart") {
    // direction 1: source created BEFORE the evolution — its schema is
    // pinned at [id]; generations appended after the zone grew a column
    // still stream as [id] (the added column is invisible until the
    // consumer restarts with the new schema)
    val zone = freshZone()
    TxLog.replace(spark, zone, spark.range(5L).toDF("id"))
    val q = spark.readStream.format(fmt).option("zone", zone).load()
      .writeStream.format("memory").queryName("zsrc_evo1").outputMode("append")
      .start()
    q.processAllAvailable()
    TxLog.append(spark, zone,
      spark.range(5L, 9L).selectExpr("id", "id * 10 AS v"))
    q.processAllAvailable(); q.stop()
    val got = spark.table("zsrc_evo1")
    assert(got.columns.toSeq === Seq("id"), "pinned schema must hold mid-stream")
    assert(got.as[Long].collect().toSet === (0L until 9L).toSet)

    // direction 2: source created AFTER the evolution — the initial
    // snapshot serves pre-evolution files with the evolved schema, the
    // missing column surfacing as null (the batch reader's contract)
    val q2 = spark.readStream.format(fmt).option("zone", zone).load()
      .writeStream.format("memory").queryName("zsrc_evo2").outputMode("append")
      .start()
    q2.processAllAvailable(); q2.stop()
    val snap = spark.table("zsrc_evo2")
    assert(snap.columns.toSeq === Seq("id", "v"))
    assert(snap.count() === 9L)
    assert(snap.filter(col("v").isNull).count() === 5L,
      "pre-evolution rows must surface the new column as null")
    assert(snap.filter(col("v").isNotNull).as[(Long, Long)].collect().toSet ===
      (5L until 9L).map(i => (i, i * 10)).toSet)
  }

  test("a pushed filter on an evolved column keeps stat-less old files (never skips blind)") {
    val zone = freshZone()
    val oldFiles = TxLog.replace(spark, zone,
      spark.range(5L).toDF("id")).files.size.toLong
    // evolution + stats tracking start TOGETHER: the gen-0 files have no
    // stats for v at all, so a v-predicate must keep ALL of them while
    // still pruning the new stat-carrying files outside the range
    TxLog.append(spark, zone,
      spark.range(5L, 9L).selectExpr("id", "id * 10 AS v"),
      statsCols = Seq("v"))
    val q = spark.readStream.format(fmt).option("zone", zone).load()
      .filter(col("v") >= 80L)
      .writeStream.format("memory").queryName("zsrc_evo3").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    val (served, total) = graft.plans.PushdownProbe.get(s"txlog:$zone").get
    assert(served < total, s"new files outside the range must prune: $served/$total")
    assert(served >= oldFiles,
      s"stat-less pre-evolution files must never be skipped: " +
        s"served $served < $oldFiles old files (total $total)")
    assert(spark.table("zsrc_evo3").selectExpr("id").as[Long].collect().toSet
      === Set(8L))
  }

  test("the provider resolves by its registered short name") {
    val zone = freshZone()
    TxLog.replace(spark, zone, spark.range(3L).toDF("id"))
    val q = spark.readStream.format("txlog").option("zone", zone).load()
      .writeStream.format("memory").queryName("zsrc_short").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("zsrc_short").count() === 3L)
  }

  test("startingGen skips history: only post-start generations stream") {
    val zone = freshZone()
    TxLog.replace(spark, zone, spark.range(10L).toDF("id"))
    val g = TxLog.latest(spark, zone).get.gen
    TxLog.append(spark, zone, spark.range(10L, 15L).toDF("id"))
    val q = spark.readStream.format(fmt)
      .option("zone", zone).option("startingGen", g.toString).load()
      .writeStream.format("memory").queryName("zsrc2").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("zsrc2").as[Long].collect().toSet === (10L until 15L).toSet)
  }

  test("startingTimestamp streams commits at or after the time (Delta semantics)") {
    val zone = freshZone()
    TxLog.replace(spark, zone, spark.range(10L).toDF("id"))
    Thread.sleep(1100) // clear 1s-granularity mtime clocks on both sides
    val between = System.currentTimeMillis()
    Thread.sleep(1100)
    TxLog.append(spark, zone, spark.range(10L, 15L).toDF("id"))
    // between the commits: only the later one streams
    val q = spark.readStream.format(fmt)
      .option("zone", zone).option("startingTimestamp", between.toString).load()
      .writeStream.format("memory").queryName("zsrc_ts").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("zsrc_ts").as[Long].collect().toSet ===
      (10L until 15L).toSet,
      "only the commit at-or-after the timestamp must stream")
    // before everything: the whole zone streams (default-mode contract)
    val q2 = spark.readStream.format(fmt)
      .option("zone", zone).option("startingTimestamp", "2000-01-01").load()
      .writeStream.format("memory").queryName("zsrc_ts2").outputMode("append")
      .start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.table("zsrc_ts2").as[Long].collect().toSet ===
      (0L until 15L).toSet,
      "a timestamp before the zone's first commit must stream everything")
    // both travel options together: refused (direct createSource — the
    // writer path would surface this lazily on the stream thread)
    intercept[IllegalArgumentException] {
      new graft.sources.TxLogStreamProvider().createSource(
        spark.sqlContext, "/tmp/zsrc_ts_meta", None, "txlog",
        Map("zone" -> zone, "startingGen" -> "0",
          "startingTimestamp" -> between.toString))
    }
    // and the history surface exposes the commit clock this travels by:
    // commit_ts rows straddle `between` exactly as the reads did
    val h = graft.operators.TxLog.history(spark, zone)
      .selectExpr("gen", "CAST(commit_ts AS LONG) * 1000 AS ms")
      .as[(Long, Long)].collect().toMap
    val head = graft.operators.TxLog.latest(spark, zone).get.gen
    assert(h(head) >= between && h(head - 1) <= between,
      s"history commit_ts must bracket the probe time: $h vs $between")
  }

  test("checkpoint restart resumes from the committed generation") {
    val zone = freshZone()
    val ckpt = java.nio.file.Files.createTempDirectory("zsrc_ckpt").toString
    TxLog.replace(spark, zone, spark.range(5L).toDF("id"))

    // batches land in a per-run buffer via foreachBatch (the memory sink
    // does not support checkpoint recovery)
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[Long])]
    def runOnce(): Unit = {
      val q = spark.readStream.format(fmt).option("zone", zone).load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          seen.synchronized {
            seen += batchId -> df.select("id").as[Long].collect().toSet
          }: Unit
        }
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }

    runOnce()
    assert(seen.map(_._2).reduce(_ ++ _) === (0L until 5L).toSet)
    seen.clear()
    TxLog.append(spark, zone, spark.range(5L, 12L).toDF("id"))
    // a fresh query on the same checkpoint must serve ONLY the delta
    runOnce()
    val got = seen.map(_._2).foldLeft(Set.empty[Long])(_ ++ _)
    assert(got === (5L until 12L).toSet,
      s"restart must resume from the committed generation, got $got")
  }

  test("a compaction inside a batch window fails the stream loudly") {
    val zone = freshZone()
    TxLog.replace(spark, zone, spark.range(100L).toDF("id").repartition(8))
    val q = spark.readStream.format(fmt).option("zone", zone).load()
      .writeStream.format("memory").queryName("zsrc4").outputMode("append")
      .start()
    q.processAllAvailable()
    // rewrite history: appends + a compact that collapses them
    TxLog.append(spark, zone, spark.range(100L, 120L).toDF("id"))
    TxLog.compact(spark, zone, targetBytes = 1L << 30)
    val e = intercept[StreamingQueryException] {
      q.processAllAvailable()
      q.stop()
    }
    assert(e.getMessage.contains("not append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("not append-only")),
      s"expected the append-only refusal, got: ${e.getMessage}")
  }

  test("a vacuumed-away consumer offset fails loudly, never serves a partial diff") {
    val zone = freshZone()
    TxLog.replace(spark, zone, spark.range(10L).toDF("id"))
    val g1 = TxLog.latest(spark, zone).get.gen
    TxLog.append(spark, zone, spark.range(10L, 20L).toDF("id"))
    TxLog.append(spark, zone, spark.range(20L, 30L).toDF("id"))
    // retention passes the consumer's generation: keepGens=1, no grace
    TxLog.vacuum(spark, zone, keepGens = 1, graceMs = 0L)
    assert(TxLog.snapshotAt(spark, zone, g1).isEmpty, "fixture: g1 should be gone")
    val q = spark.readStream.format(fmt)
      .option("zone", zone).option("startingGen", g1.toString).load()
      .writeStream.format("memory").queryName("zsrc_vac").outputMode("append")
      .start()
    val e = intercept[StreamingQueryException] {
      q.processAllAvailable()
      q.stop()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(msgs.contains("vacuumed"),
      s"expected the vacuumed-offset refusal, got: $msgs")
  }

  test("streaming out composes with merge-sink streaming in (zone-to-zone)") {
    // the full lake loop: an append-only staging zone streams into a
    // merged current-state zone through the exactly-once upsert sink
    val staging = freshZone()
    val state = freshZone()
    TxLog.replace(spark, staging,
      Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("id", "seq", "payload"))
    val q = spark.readStream.format(fmt).option("zone", staging).load()
      .writeStream
      .foreachBatch(TxLog.cdcMergeSink(state, "id", "seq"))
      .outputMode("update").start()
    q.processAllAvailable()
    TxLog.append(spark, staging,
      Seq((1L, 2L, "a2"), (3L, 1L, "c")).toDF("id", "seq", "payload"))
    q.processAllAvailable()
    q.stop()
    val got = TxLog.read(spark, state)
      .select($"id", $"seq", $"payload").as[(Long, Long, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(1L -> ((2L, "a2")), 2L -> ((1L, "b")), 3L -> ((1L, "c"))))
  }
}
