package graft

import org.apache.spark.sql.functions._
import graft.operators.TxLog

/** The delta-commit + checkpoint layer's contract — the 100 TB metadata
  * bound: commit bytes are O(touched files) not O(table), head
  * resolution needs only the checkpoint plus the tail commits after it,
  * and vacuum folds history so the log dir stays bounded no matter how
  * many generations a streaming sink has published. */
class TxLogCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def freshZone(): String =
    java.nio.file.Files.createTempDirectory("graft_txchk").toString + "/zone"

  private def logFiles(zone: String): Seq[java.io.File] =
    Option(new java.io.File(zone, "_txlog").listFiles()).map(_.toSeq)
      .getOrElse(Nil)

  private def genFile(zone: String, gen: Long): java.io.File =
    new java.io.File(new java.io.File(zone, "_txlog"), "gen-" + "%020d".format(gen))

  private def chkFile(zone: String, gen: Long): java.io.File =
    new java.io.File(new java.io.File(zone, "_txlog"), "chk-" + "%020d".format(gen))

  private def ids(zone: String): Set[Long] =
    TxLog.read(spark, zone).select($"id").as[Long].collect().toSet

  test("a merge commit's manifest bytes scale with touched files, not table size") {
    val zone = freshZone()
    // 32-file range-clustered zone with per-file key stats
    TxLog.replace(spark, zone,
      spark.range(32000L).toDF("id").repartitionByRange(32, col("id")),
      statsCols = Seq("id"))
    val fullBytes = genFile(zone, 1L).length()
    // a merge touching ONE key band rewrites ~1 of 32 files
    val st = TxLog.merge(spark, zone,
      spark.range(100L, 200L).toDF("id"), key = "id")
    assert(st.filesTouched <= 2L,
      s"stats pruning should bound the rewrite, touched ${st.filesTouched}")
    val deltaBytes = genFile(zone, st.gen).length()
    // the replace wrote a FULL manifest (every file new); the merge must
    // have written a DELTA commit several times smaller (the carried
    // schema meta is the constant floor) — the property that keeps a
    // 60 s streaming sink from writing O(table) metadata per batch
    assert(deltaBytes * 4 < fullBytes,
      s"merge commit is not delta-sized: $deltaBytes vs full $fullBytes")
    // and INDEPENDENT of zone width: the same one-band merge against a
    // zone with 4x the files must not grow the commit (O(touched), not
    // O(table) — the bound itself, not a ratio proxy)
    val wide = freshZone()
    TxLog.replace(spark, wide,
      spark.range(128000L).toDF("id").repartitionByRange(128, col("id")),
      statsCols = Seq("id"))
    val stw = TxLog.merge(spark, wide,
      spark.range(100L, 200L).toDF("id"), key = "id")
    val wideDelta = genFile(wide, stw.gen).length()
    assert(wideDelta < deltaBytes * 2,
      s"delta grew with zone width: $wideDelta vs $deltaBytes")
    val body = new String(
      java.nio.file.Files.readAllBytes(genFile(zone, st.gen).toPath), "UTF-8")
    assert(body.contains("kind=delta"), "merge should commit as a delta")
    // the delta lists only the touched adds/removes, never the zone
    val fLines = body.linesIterator.count(_.startsWith("f "))
    val rLines = body.linesIterator.count(_.startsWith("r "))
    assert(rLines <= 2 && fLines <= 34,
      s"delta actions should cover touched files only: $fLines adds, $rLines removes")
    assert(ids(zone) === (0L until 32000L).toSet)
  }

  test("appends write deltas; every 10th generation checkpoints and bumps the pointer") {
    val zone = freshZone()
    spark.range(10L).toDF("id").write.parquet(zone)
    TxLog.init(spark, zone)
    for (i <- 1 to 22)
      TxLog.append(spark, zone,
        spark.range(i * 10L, i * 10L + 10L).toDF("id"))
    // gen 1..22 are deltas; chk-10 and chk-20 exist; pointer says 20
    assert(new String(java.nio.file.Files.readAllBytes(
      genFile(zone, 5L).toPath), "UTF-8").contains("kind=delta"))
    assert(chkFile(zone, 10L).exists() && chkFile(zone, 20L).exists(),
      "interval checkpoints missing")
    assert(!chkFile(zone, 15L).exists(), "off-interval checkpoint written")
    val ptr = new java.io.File(new java.io.File(zone, "_txlog"), "_last_checkpoint")
    assert(ptr.exists() &&
      new String(java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim == "20")
    assert(ids(zone) === (0L until 230L).toSet)
    assert(TxLog.latest(spark, zone).exists(_.gen === 22L))
  }

  test("head resolution reads checkpoint + tail only: history below the checkpoint can vanish") {
    val zone = freshZone()
    spark.range(10L).toDF("id").write.parquet(zone)
    TxLog.init(spark, zone)
    for (i <- 1 to 13)
      TxLog.append(spark, zone,
        spark.range(i * 10L, i * 10L + 10L).toDF("id"))
    // simulate deep history GC: every commit BELOW the chk-10 anchor gone
    for (g <- 0L until 10L) assert(!genFile(zone, g).exists() || genFile(zone, g).delete())
    // latest() must still resolve gen 13 = chk-10 + deltas 11..13 — the
    // O(pointer + tail) bound, proven by construction (nothing below the
    // checkpoint exists to read)
    val head = TxLog.latest(spark, zone)
    assert(head.exists(_.gen === 13L), s"head did not resolve from checkpoint: $head")
    assert(ids(zone) === (0L until 140L).toSet)
    // time travel to the checkpointed generation itself also works
    assert(TxLog.snapshotAt(spark, zone, 10L).exists(_.gen === 10L))
    // but a generation whose chain is gone reports gone, never garbage
    assert(TxLog.snapshotAt(spark, zone, 5L).isEmpty)
  }

  test("vacuum folds history: long streaming history leaves a bounded log dir") {
    val zone = freshZone()
    spark.range(4L).toDF("id").write.parquet(zone)
    TxLog.init(spark, zone)
    for (i <- 1 to 30)
      TxLog.append(spark, zone,
        spark.range(i * 4L, i * 4L + 4L).toDF("id"))
    assert(logFiles(zone).count(_.getName.startsWith("gen-")) === 31)
    TxLog.vacuum(spark, zone, keepGens = 2, graceMs = 0L)
    val after = logFiles(zone).map(_.getName)
    // kept: gen-29, gen-30, their anchor chk-29, the interval chk-30,
    // and the pointer — the log dir is BOUNDED by keepGens + interval
    // regardless of history length (the #1 design gap the delta layer
    // closes: head resolution and commit cost no longer grow with age)
    assert(after.count(_.startsWith("gen-")) === 2, s"log dir not folded: $after")
    assert(after.count(_.startsWith("chk-")) <= 2, s"stale checkpoints kept: $after")
    assert(TxLog.latest(spark, zone).exists(_.gen === 30L))
    assert(ids(zone) === (0L until 124L).toSet)
    // time travel INSIDE retention still works...
    assert(TxLog.snapshotAt(spark, zone, 29L).exists(_.gen === 29L))
    val s29 = TxLog.readSnapshot(spark, zone,
      TxLog.snapshotAt(spark, zone, 29L).get)
    assert(s29.count() === 120L)
    // ...and OUTSIDE retention refuses loudly (gone, not wrong)
    assert(TxLog.snapshotAt(spark, zone, 7L).isEmpty)
    intercept[RuntimeException] {
      TxLog.appendedBetween(spark, zone, 7L)
    }
    // a second vacuum after more commits keeps folding
    for (i <- 31 to 40)
      TxLog.append(spark, zone, spark.range(i * 4L, i * 4L + 4L).toDF("id"))
    TxLog.vacuum(spark, zone, keepGens = 2, graceMs = 0L)
    assert(logFiles(zone).count(_.getName.startsWith("gen-")) === 2)
    assert(TxLog.latest(spark, zone).exists(_.gen === 40L))
    assert(ids(zone) === (0L until 164L).toSet)
  }

  test("history: one row per surviving commit with its operation, newest first") {
    val zone = freshZone()
    TxLog.replace(spark, zone,
      spark.range(1000L).toDF("id").repartitionByRange(4, col("id")),
      statsCols = Seq("id"))
    TxLog.append(spark, zone, spark.range(1000L, 1100L).toDF("id"))
    TxLog.merge(spark, zone, spark.range(50L).select(($"id" + 5000L).as("id")),
      key = "id")
    TxLog.deleteWhereCol(spark, zone, "id", 0L, 99L)
    assert(TxLog.compact(spark, zone, targetBytes = 1L << 30).rewritten)
    TxLog.restore(spark, zone, 3L)
    val h = TxLog.history(spark, zone)
      .select($"gen", $"kind", $"op").as[(Long, String, String)].collect().toSeq
    assert(h.map(_._1) === Seq(6L, 5L, 4L, 3L, 2L, 1L, 0L), "newest first, contiguous")
    assert(h.map(_._3) === Seq("restore", "compact", "delete", "merge",
      "append", "replace", "init"))
    // kinds: full rewrites anchor as full manifests; touched-file
    // commits are deltas
    val kinds = h.map(x => x._1 -> x._2).toMap
    assert(kinds(1L) === "full" && kinds(5L) === "full")
    assert(kinds(2L) === "delta" && kinds(3L) === "delta" && kinds(4L) === "delta")
    // vacuum truncates history to retention
    TxLog.vacuum(spark, zone, keepGens = 2, graceMs = 0L)
    assert(TxLog.history(spark, zone).select($"gen").as[Long].collect().toSet
      === Set(5L, 6L))
  }

  test("maxGensPerBatch: a deep backlog drains in bounded bites, exactly once") {
    val zone = freshZone()
    spark.range(10L).toDF("id").write.parquet(zone)
    TxLog.init(spark, zone)
    TxLog.append(spark, zone, spark.range(10L, 20L).toDF("id"))
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("txlog")
      .option("zone", zone).option("startingGen", "0")
      .option("maxGensPerBatch", "2").load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count() }: Unit
      }.start()
    q.processAllAvailable()
    assert(batches.toSeq === Seq(10L))
    // a 6-generation backlog lands while the query runs: with the cap it
    // must drain in >= 3 bites of <= 2 generations (20 rows) each — the
    // catch-up shape a consumer behind a busy zone actually needs
    for (i <- 2 to 7)
      TxLog.append(spark, zone, spark.range(i * 10L, i * 10L + 10L).toDF("id"))
    q.processAllAvailable(); q.stop()
    // 70 = gens 1..7 (startingGen=0 streams changes AFTER gen 0; the
    // init generation's own rows are excluded by the explicit-start
    // contract)
    assert(batches.sum === 70L, s"backlog must drain exactly once: $batches")
    val catchUp = batches.drop(1)
    assert(catchUp.size >= 3 && catchUp.forall(_ <= 20L),
      s"catch-up must be bounded bites of <= 2 gens: $batches")
  }

  test("reconstructed state equals the state a full-manifest log would carry") {
    val zone = freshZone()
    // mixed history: replace (full), appends (delta), merge (delta),
    // delete (delta), compact (full) — stats and meta must survive every
    // fold exactly, because readWhereCol/metadataCount read them
    TxLog.replace(spark, zone,
      spark.range(1000L).toDF("id").repartitionByRange(4, col("id")),
      statsCols = Seq("id"))
    TxLog.append(spark, zone,
      spark.range(1000L, 1500L).toDF("id").repartitionByRange(2, col("id")))
    TxLog.merge(spark, zone,
      spark.range(100L, 150L).select(($"id" + 10000L).as("id")), key = "id")
    TxLog.deleteWhereCol(spark, zone, "id", 200L, 299L)
    val head = TxLog.latest(spark, zone).get
    // metadataCount: every live file carries row stats through the folds
    assert(TxLog.metadataCount(spark, zone) ===
      Some(1000L + 500L + 50L - 100L))
    // stats-pruned read agrees with the exact predicate over a full scan
    val got = TxLog.readWhereCol(spark, zone, "id", 1100L, 1199L)
      .select($"id").as[Long].collect().toSet
    assert(got === (1100L to 1199L).toSet)
    // schema + stats.cols meta survived the delta folds
    assert(head.meta("stats.cols") === "id")
    assert(TxLog.zoneSchema(head).isDefined)
    // pinned old snapshot (pre-delete) still reconstructs exactly
    val pre = TxLog.snapshotAt(spark, zone, head.gen - 1).get
    assert(TxLog.readSnapshot(spark, zone, pre).count() === 1550L)
  }

  test("multi-part checkpoints: shard past the line threshold, read back whole, GC with their gen") {
    // The 100 TB checkpoint bound: ~800k per-file lines in ONE file is a
    // 60 MB single-writer PUT and a single-threaded re-read. Past the
    // shard threshold the per-file payload splits into chp-<gen>-<i>-of-<n>
    // parts; the base chk-<gen> (written LAST, the commit marker) carries
    // the header + count. Pinned: the sharded checkpoint resolves
    // bit-identically, survives history loss below it, reads as ABSENT
    // when a part is torn, and its parts vacuum with their generation.
    val zone = freshZone()
    sys.props("graft.txlog.chk.shardLines") = "25"
    try {
      // 10 appends x 4 files with id stats: per-file lines at gen 10 =
      // 40 f + 40 t + 40 b > 25 -> sharded checkpoint at gen 10
      TxLog.replace(spark, zone,
        spark.range(0L, 100L).toDF("id").repartition(4), statsCols = Seq("id"))
      (1 until 10).foreach(i =>
        TxLog.append(spark, zone,
          spark.range(i * 100L, i * 100L + 100L).toDF("id").repartition(4)))
      val head = TxLog.latest(spark, zone).get
      assert(head.gen === 10L)
      val parts = logFiles(zone).map(_.getName).filter(_.startsWith("chp-"))
      assert(parts.size >= 2, s"expected shards, log dir: ${logFiles(zone).map(_.getName)}")
      assert(chkFile(zone, 10L).exists, "the base chk- marker must exist")
      // the sharded checkpoint IS the anchor: the gen-10 manifest (and
      // everything below) can vanish and the state still reconstructs
      (1L to 10L).foreach(g => genFile(zone, g).delete())
      val resolved = TxLog.snapshotAt(spark, zone, 10L).get
      assert(resolved.files.toSet === head.files.toSet)
      assert(resolved.colStats === head.colStats, "typed stats must survive sharding")
      assert(resolved.sizes === head.sizes, "sizes must survive sharding")
      assert(ids(zone) === (0L until 1000L).toSet)
      // a torn part = no checkpoint at all (never a partial state)
      val onePart = logFiles(zone).filter(_.getName.startsWith("chp-")).head
      val bytes = java.nio.file.Files.readAllBytes(onePart.toPath)
      java.nio.file.Files.write(onePart.toPath, bytes.dropRight(8))
      assert(TxLog.snapshotAt(spark, zone, 10L).isEmpty,
        "a torn shard must make the whole checkpoint read as absent")
      java.nio.file.Files.write(onePart.toPath, bytes) // repair
      assert(TxLog.snapshotAt(spark, zone, 10L).isDefined)
      // parts GC with their generation: advance past a NEWER checkpoint,
      // then vacuum to it
      (10 until 21).foreach(i =>
        TxLog.append(spark, zone,
          spark.range(i * 100L, i * 100L + 100L).toDF("id").repartition(4)))
      TxLog.vacuum(spark, zone, keepGens = 2, graceMs = 0L)
      val after = logFiles(zone).map(_.getName).filter(_.startsWith("chp-"))
      assert(!after.exists(_.startsWith("chp-00000000000000000010")),
        s"gen-10 shards must vacuum with their generation: $after")
      assert(ids(zone) === (0L until 2100L).toSet)
    } finally sys.props.remove("graft.txlog.chk.shardLines")
  }
}
