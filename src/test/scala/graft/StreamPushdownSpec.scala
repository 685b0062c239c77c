package graft

import org.apache.spark.sql.functions._
import graft.operators.TxLog
import graft.plans.PushdownProbe
import graft.sources.ShardStore

/** The streaming filter-pushdown hook (SURVEY §4, round-8 directive #4):
  * a `.filter(...)` in the STREAMING query plan must reach the v1
  * source's batch construction — the shard source serves only matching
  * shards / tightened sequence windows, the txlog source opens only
  * stats-overlapping files — with results bit-identical to the
  * unfiltered-source + filter-above plan (superset contract: the
  * original Filter always still runs). PushdownProbe records
  * (served, total) units per scan at buildRDD time. */
class StreamPushdownSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---- shard transport ------------------------------------------------

  private def shardFixture(): (String, ShardStore) = {
    val dir = freshDir("graft_push_shards")
    val st = new ShardStore(dir)
    st.createStream(3)
    for (i <- 0 until 60) st.put(s"key-${i % 11}", s"v$i")
    (dir, st)
  }

  private def runShardStream(dir: String,
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : Set[(String, Long, String)] = {
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String)]
    val q = f(spark.readStream.format("shardstore").option("dir", dir).load())
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized { seen ++= df.as[(String, Long, String)].collect() }: Unit
      }.start()
    q.processAllAvailable(); q.stop()
    seen.toSet
  }

  test("shard predicate prunes whole shards; rows identical to filter-above") {
    val (dir, st) = shardFixture()
    val all = runShardStream(dir, identity)
    val (servedAll, totalAll) = PushdownProbe.get(s"shardstore:$dir").get
    assert(servedAll === totalAll && totalAll === 60L,
      "unfiltered stream must serve every record")

    // pick a shard that actually has records, and one that has fewer than all
    val target = st.shards().map(s => s.id -> st.maxSeq(s.id))
      .filter(_._2 > 0L).maxBy(_._2)._1
    val got = runShardStream(dir, _.filter(col("shard") === target))
    val (served, total) = PushdownProbe.get(s"shardstore:$dir").get
    assert(total === 60L)
    assert(served < total, s"pushed shard filter must read less: $served/$total")
    assert(served === all.count(_._1 == target).toLong,
      "pruned scan must serve exactly the target shard's records")
    assert(got === all.filter(_._1 == target), "rows must be hash-identical")
  }

  test("seq bounds tighten the per-shard windows; rows identical") {
    val (dir, _) = shardFixture()
    val all = runShardStream(dir, identity)
    val got = runShardStream(dir, _.filter(col("seq") > 2L && col("seq") <= 4L))
    val (served, total) = PushdownProbe.get(s"shardstore:$dir").get
    assert(total === 60L)
    assert(served < total, s"pushed seq range must read less: $served/$total")
    assert(got === all.filter(r => r._2 > 2L && r._2 <= 4L))
    // the windows are dense, so the scan serves EXACTLY the matching rows
    assert(served === got.size.toLong)
  }

  test("the strategy is registered here, and the vanilla-session fallback frame is the full batch") {
    // graft sessions carry the extension (the GraftScan path); a vanilla
    // session would take the StreamBridge fallback, whose frame is
    // buildRDD(Nil) — assert both halves of that dispatch
    assert(graft.plans.GraftScanStrategy.registeredIn(spark))
    val (dir, st) = shardFixture()
    val specs = st.shards().map(s => (s.id, 0L, st.maxSeq(s.id)))
      .filter(t => t._3 > t._2)
    val scan = graft.sources.ShardPrunableScan(spark, dir, specs)
    val fallback = org.apache.spark.sql.graft.StreamBridge
      .streamingDataFrame(spark, scan.buildRDD(Nil),
        graft.sources.ShardStreamSource.schema)
    assert(fallback.isStreaming)
    // the unpruned fallback scan serves every record
    val (served, total) = PushdownProbe.get(s"shardstore:$dir").get
    assert(served === total && total === 60L)
  }

  test("an unsupported predicate prunes nothing and changes nothing") {
    val (dir, _) = shardFixture()
    val all = runShardStream(dir, identity)
    val got = runShardStream(dir, _.filter(col("value").endsWith("7")))
    val (served, total) = PushdownProbe.get(s"shardstore:$dir").get
    assert(served === total, "value predicates are not prunable — full scan")
    assert(got === all.filter(_._3.endsWith("7")))
  }

  test("pushdown composes with maxRecordsPerShard backpressure: capped AND pruned, no loss") {
    // the cap shapes OFFSETS (offer windows); pruning shapes the BATCH
    // (which specs get read) — they must compose without either dropping
    // records or regressing cursors
    val dir = freshDir("graft_push_cap")
    val st = new ShardStore(dir)
    st.createStream(3)
    st.put("k0", "seed")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String)]
    var batches = 0
    val q = spark.readStream.format("shardstore").option("dir", dir)
      .option("maxRecordsPerShard", "5").load()
      .filter(col("seq") > 1L)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= df.as[(String, Long, String)].collect(); batches += 1
        }: Unit
      }.start()
    q.processAllAvailable()
    for (i <- 0 until 60) st.put(s"key-${i % 11}", s"v$i")
    q.processAllAvailable(); q.stop()
    // ground truth: every record with per-shard seq > 1, exactly once
    val expected = st.shards().flatMap(s =>
      st.get(s.id, 1L).map { case (sq, v) => (s.id, sq, v) }).toSet
    assert(seen.toSet === expected,
      "capped + pruned stream must still deliver every matching record once")
    assert(batches >= 4,
      s"the 5-per-shard cap must split the catch-up into several batches, got $batches")
  }

  test("pushdown survives a checkpointed restart: delta batches stay pruned and exact") {
    val (dir, st) = shardFixture()
    val ckpt = freshDir("graft_push_ckpt")
    val target = st.shards().map(s => s.id -> st.maxSeq(s.id))
      .filter(_._2 > 0L).maxBy(_._2)._1
    val seen = scala.collection.mutable.ArrayBuffer.empty[(String, Long, String)]
    def runOnce(): Unit = {
      val q = spark.readStream.format("shardstore").option("dir", dir).load()
        .filter(col("shard") === target)
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= df.as[(String, Long, String)].collect() }: Unit
        }.start()
      q.processAllAvailable(); q.stop()
    }
    runOnce()
    val firstRun = seen.size
    assert(firstRun > 0)
    val (s1, t1) = PushdownProbe.get(s"shardstore:$dir").get
    assert(s1 < t1, "first run must prune")
    // restart on the same checkpoint after new puts: only the delta is
    // served, still shard-pruned, and rows equal the ground truth
    for (i <- 60 until 90) st.put(s"key-${i % 11}", s"v$i")
    runOnce()
    val (s2, _) = PushdownProbe.get(s"shardstore:$dir").get
    val expected = st.get(target, 0L).map { case (q, v) => (target, q, v) }.toSet
    assert(seen.toSet === expected,
      "restart + pushdown must deliver exactly the target shard's records once")
    assert(s2 <= expected.size.toLong,
      s"the delta batch must serve at most the target shard's delta, got $s2")
  }

  // ---- txlog zone -----------------------------------------------------

  test("txlog stream: stats-tracked range predicate opens only overlapping files") {
    val zone = freshDir("graft_push_zone") + "/zone"
    // 4 range-partitioned files per generation -> tight per-file k stats
    TxLog.replace(spark, zone,
      spark.range(100L).toDF("k").repartitionByRange(4, col("k")),
      statsCols = Seq("k"))

    // batch ground truth for the same predicate
    val expectInit = TxLog.read(spark, zone).filter(col("k") < 25L)
      .as[Long].collect().toSet

    val q = spark.readStream.format("txlog").option("zone", zone).load()
      .filter(col("k") < 25L)
      .writeStream.format("memory").queryName("push_zone").outputMode("append")
      .start()
    q.processAllAvailable()
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(total === 4L, s"fixture must commit 4 files, got $total")
    assert(served < total, s"initial snapshot must be file-pruned: $served/$total")
    assert(spark.table("push_zone").as[Long].collect().toSet === expectInit,
      "pruned initial snapshot must equal the batch filter result")

    // delta batch: only the appended files overlapping the range are opened
    TxLog.append(spark, zone,
      spark.range(1000L, 1100L).toDF("k").repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    q.processAllAvailable(); q.stop()
    val (served2, total2) = PushdownProbe.get(s"txlog:$zone").get
    assert(total2 === 4L, "the delta window holds the 4 appended files")
    assert(served2 === 0L,
      s"no appended file overlaps k < 25 — all pruned, got $served2")
    assert(spark.table("push_zone").as[Long].collect().toSet === expectInit,
      "the non-overlapping append must add no rows")
  }

  test("txlog stream: IN-list keeps the union of per-value overlaps") {
    val zone = freshDir("graft_push_in") + "/zone"
    TxLog.replace(spark, zone,
      spark.range(100L).toDF("k").repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    val q = spark.readStream.format("txlog").option("zone", zone).load()
      .filter(col("k").isin(3L, 97L))
      .writeStream.format("memory").queryName("push_in").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(total === 4L)
    assert(served === 2L, s"3 and 97 live in different files: $served/$total")
    assert(spark.table("push_in").as[Long].collect().toSet === Set(3L, 97L))
  }

  test("txlog stream: IS NOT NULL skips files whose tracked column is all-null") {
    val zone = freshDir("graft_push_nn") + "/zone"
    // files range-partitioned by k; v is entirely NULL for k < 50 —
    // null-count stats let the v-IS-NOT-NULL stream skip those files
    TxLog.replace(spark, zone,
      spark.range(100L).selectExpr("id AS k",
          "CASE WHEN id < 50 THEN NULL ELSE id END AS v")
        .repartitionByRange(4, col("k")),
      statsCols = Seq("v"))
    val q = spark.readStream.format("txlog").option("zone", zone).load()
      .filter(col("v").isNotNull)
      .writeStream.format("memory").queryName("push_nn").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(total === 4L)
    assert(served === 2L, s"the two all-null-v files must be skipped: $served/$total")
    assert(spark.table("push_nn").count() === 50L)
  }

  test("pushed txlog filters also reach the parquet row-group scan of kept files") {
    val zone = freshDir("graft_push_rg") + "/zone"
    TxLog.replace(spark, zone,
      spark.range(100L).toDF("k").repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    val head = TxLog.latest(spark, zone).get
    val scan = graft.sources.TxLogPrunableScan(spark, zone, head, head.files,
      TxLog.read(spark, zone).schema)
    val plan = scan.innerFrame(
      Seq(org.apache.spark.sql.sources.LessThan("k", 25L)), head.files)
      .queryExecution.executedPlan.toString
    // two-level skip: the manifest pruned files ABOVE this plan; inside
    // it, the parquet scan must carry the predicate for row-group min/max
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(k,25)"),
      s"parquet scan must carry the pushed predicate:\n$plan")
  }

  test("txlog stream: column pruning narrows the scan to the selected columns") {
    val zone = freshDir("graft_push_cols") + "/zone"
    TxLog.replace(spark, zone,
      spark.range(50L).selectExpr("id AS k", "id * 2 AS v", "id * 3 AS w",
        "CAST(id AS STRING) AS s"))
    val q = spark.readStream.format("txlog").option("zone", zone).load()
      .select(col("v"))
      .writeStream.format("memory").queryName("push_cols").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    assert(PushdownProbe.getCols(s"txlog:$zone") === Some(Seq("v")),
      "the scan must serve only the selected column")
    assert(spark.table("push_cols").as[Long].collect().toSet ===
      (0L until 50L).map(_ * 2).toSet)

    // filter + narrow select: the scan serves the union of both needs
    val q2 = spark.readStream.format("txlog").option("zone", zone).load()
      .filter(col("k") < 10L).select(col("w"))
      .writeStream.format("memory").queryName("push_cols2").outputMode("append")
      .start()
    q2.processAllAvailable(); q2.stop()
    assert(PushdownProbe.getCols(s"txlog:$zone").get.toSet === Set("k", "w"),
      "the filter's column must survive the narrowing")
    assert(spark.table("push_cols2").as[Long].collect().toSet ===
      (0L until 10L).map(_ * 3).toSet)
  }

  test("GraftScanExec exposes the skip as SQLMetrics, not just the dev probe") {
    import org.apache.spark.sql.catalyst.types.DataTypeUtils
    // txlog leg: a range predicate over a 4-file zone
    val zone = freshDir("graft_push_metrics") + "/zone"
    TxLog.replace(spark, zone,
      spark.range(100L).toDF("k").repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    val head = TxLog.latest(spark, zone).get
    val schema = TxLog.read(spark, zone).schema
    val scan = graft.sources.TxLogPrunableScan(spark, zone, head, head.files, schema)
    val exec = graft.plans.GraftScanExec(DataTypeUtils.toAttributes(schema), scan,
      Seq(org.apache.spark.sql.sources.LessThan("k", 25L)))
    val rows = exec.execute().count()
    assert(exec.metrics("unitsTotal").value === 4L)
    assert(exec.metrics("unitsServed").value < 4L &&
      exec.metrics("unitsServed").value >= 1L,
      s"metrics must show the file skip: ${exec.metrics("unitsServed").value}/4")
    assert(exec.metrics("columnsServed").value === 1L)
    assert(exec.metrics("numOutputRows").value === rows,
      "the executor-side row counter must flow back into the metric")
    assert(rows >= 25L, "superset contract: at least every matching row")

    // shard leg: the same metrics on the shard transport's exec
    val (dir, st) = shardFixture()
    val specs = st.shards().map(s => (s.id, 0L, st.maxSeq(s.id)))
      .filter(t => t._3 > t._2)
    val target = specs.maxBy(t => t._3 - t._2)._1
    val sscan = graft.sources.ShardPrunableScan(spark, dir, specs)
    val sexec = graft.plans.GraftScanExec(
      DataTypeUtils.toAttributes(graft.sources.ShardStreamSource.schema), sscan,
      Seq(org.apache.spark.sql.sources.EqualTo("shard", target)))
    val srows = sexec.execute().count()
    assert(sexec.metrics("unitsTotal").value === 60L)
    assert(sexec.metrics("unitsServed").value === srows,
      "dense windows: served units == served records")
    assert(srows < 60L, "the shard filter must have pruned")
  }

  test("limit pushdown: a .limit(5) shard preview reads ~5 records, not the firehose") {
    val (dir, _) = shardFixture()
    val all = runShardStream(dir, identity)
    assert(all.size === 60)
    val got = runShardStream(dir, _.limit(5))
    val (served, total) = PushdownProbe.get(s"shardstore:$dir").get
    assert(total === 60L)
    assert(served === 5L, s"the capped scan must read 5 records, got $served")
    assert(got.size === 5 && got.subsetOf(all),
      "the limited stream must deliver exactly 5 real records")
  }

  test("limit pushdown: a .limit(5) txlog preview opens one file, not the window") {
    val zone = freshDir("graft_push_lim") + "/zone"
    TxLog.replace(spark, zone,
      spark.range(100L).toDF("k").repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    val all = TxLog.read(spark, zone).as[Long].collect().toSet
    val q = spark.readStream.format("txlog").option("zone", zone).load()
      .limit(5)
      .writeStream.format("memory").queryName("push_lim").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(total === 4L)
    assert(served === 1L, s"5 rows fit the first file: $served/$total")
    val got = spark.table("push_lim").as[Long].collect().toSet
    assert(got.size === 5 && got.subsetOf(all),
      "the limited stream must deliver exactly 5 real rows")
  }

  test("limit pushdown never composes with a filtered scan (at-least-n stays safe)") {
    // filter + limit: Catalyst keeps the Limit ABOVE the Filter, so the
    // scan must serve every matching row and the plan trims to 3 — the
    // cap folding into a filter-pruned scan would risk under-serving
    val (dir, _) = shardFixture()
    val all = runShardStream(dir, identity)
    val got = runShardStream(dir, _.filter(col("seq") > 2L).limit(3))
    val expectPool = all.filter(_._2 > 2L)
    assert(got.size === math.min(3, expectPool.size) && got.subsetOf(expectPool),
      "limited+filtered stream must emit 3 rows satisfying the predicate")
  }

  test("withRequiredColumns declines unknown columns instead of crashing") {
    val zone = freshDir("graft_push_decl") + "/zone"
    TxLog.replace(spark, zone, spark.range(5L).selectExpr("id AS k", "id*2 AS v"))
    val head = TxLog.latest(spark, zone).get
    val scan = graft.sources.TxLogPrunableScan(spark, zone, head, head.files,
      TxLog.read(spark, zone).schema)
    // the PrunableScan contract is 'None when the scan cannot narrow' — a
    // caller naming a column the schema lacks gets a graceful decline
    assert(scan.withRequiredColumns(Seq("k", "nope")).isEmpty)
    assert(scan.withRequiredColumns(Nil).isEmpty)
    assert(scan.withRequiredColumns(Seq("v")).isDefined)
  }

  test("registeredIn degrades to false when the planner peek throws") {
    // the peek casts to an internal session class; if a Spark bump (or a
    // null/foreign session) breaks it, sources must take the unpruned
    // fallback — registeredIn == false — not fail every micro-batch
    assert(!graft.plans.GraftScanStrategy.registeredIn(null))
  }

  test("txlog stream: an untracked column's predicate falls back to full scan") {
    val zone = freshDir("graft_push_zone2") + "/zone"
    TxLog.replace(spark, zone,
      spark.range(40L).selectExpr("id AS k", "id % 4 AS tag")
        .repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    val q = spark.readStream.format("txlog").option("zone", zone).load()
      .filter(col("tag") === 2L)
      .writeStream.format("memory").queryName("push_zone2").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(served === total, "tag is not stats-tracked: nothing prunable")
    assert(spark.table("push_zone2").count() === 10L)
  }
}
