package graft

import org.apache.spark.sql.functions._
import graft.operators.TxLog
import graft.plans.PushdownProbe

/** The DSv2 BATCH table over txlog zones (round-9 directive #1): plain
  * `spark.read.format("txlog").option("zone", z).load()` + `.filter` /
  * `.select` / SQL must get the manifest's stats-pruned file list and
  * the narrowed read schema WITHOUT the caller using the `readWhere*`
  * APIs — the batch twin of the streaming pushdown hook, sharing
  * [[graft.sources.TxLogPrunableScan]]. Every test pins both halves:
  * fewer units served (PushdownProbe) AND rows identical to the
  * unpruned ground truth. */
class TxLogBatchTableSpec extends SparkSpec {
  import spark.implicits._

  private def freshZone(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/zone"

  /** 4 range-partitioned files with tight per-file k stats. */
  private def rangeZone(): String = {
    val zone = freshZone("graft_btbl")
    TxLog.replace(spark, zone,
      spark.range(100L).toDF("k").repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    zone
  }

  private def load(zone: String) =
    spark.read.format("txlog").option("zone", zone).load()

  test("plain spark.read + filter opens only stats-overlapping files; rows equal full scan") {
    val zone = rangeZone()
    val expect = TxLog.read(spark, zone).filter(col("k") < 25L)
      .as[Long].collect().toSet
    val got = load(zone).filter(col("k") < 25L).as[Long].collect().toSet
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(total === 4L, s"fixture must commit 4 files, got $total")
    // range-partitioner boundaries are sampled, so k < 25 may straddle a
    // file edge — but it can never need more than half the files
    assert(served < total && served <= 2L,
      s"batch read must be file-pruned: $served/$total")
    assert(got === expect, "pruned batch read must equal the full-scan filter")
  }

  test("the pushed predicate renders in explain as PushedFilters") {
    val zone = rangeZone()
    val plan = load(zone).filter(col("k") < 25L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(k,25)"),
      s"the DSv2 scan must surface the pushed predicate:\n$plan")
  }

  test("SQL over a registered view gets the same pruning") {
    val zone = rangeZone()
    load(zone).createOrReplaceTempView("btbl_zone")
    val got = spark.sql("SELECT k FROM btbl_zone WHERE k >= 75").as[Long]
      .collect().toSet
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(total === 4L && served === 1L,
      s"plain SQL must hit the same file skip: $served/$total")
    assert(got === (75L until 100L).toSet)
  }

  test("column pruning narrows the scan to the referenced columns") {
    val zone = freshZone("graft_btbl_cols")
    TxLog.replace(spark, zone,
      spark.range(50L).selectExpr("id AS k", "id * 2 AS v", "id * 3 AS w",
        "CAST(id AS STRING) AS s"))
    val got = load(zone).select(col("v")).as[Long].collect().toSet
    assert(PushdownProbe.getCols(s"txlog:$zone") === Some(Seq("v")),
      "the scan must serve only the selected column")
    assert(got === (0L until 50L).map(_ * 2).toSet)
    // count(*) (no referenced column) still executes — arity-1 fallback
    assert(load(zone).count() === 50L)
  }

  test("filter + narrow select: pruned files AND narrowed columns together") {
    val zone = freshZone("graft_btbl_both")
    TxLog.replace(spark, zone,
      spark.range(100L).selectExpr("id AS k", "id * 3 AS w")
        .repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    val got = load(zone).filter(col("k") < 10L).select(col("w"))
      .as[Long].collect().toSet
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(total === 4L && served === 1L, s"file skip must hold: $served/$total")
    assert(PushdownProbe.getCols(s"txlog:$zone").get.toSet === Set("k", "w"),
      "the filter's column must ride along with the projection's")
    assert(got === (0L until 10L).map(_ * 3).toSet)
  }

  test("an untracked column's predicate full-scans but stays correct") {
    val zone = freshZone("graft_btbl_untracked")
    TxLog.replace(spark, zone,
      spark.range(40L).selectExpr("id AS k", "id % 4 AS tag")
        .repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    val got = load(zone).filter(col("tag") === 2L).count()
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(served === total, "tag is not stats-tracked: nothing prunable")
    assert(got === 10L)
  }

  test("timestamp range predicates prune against the string-kind stats") {
    // the CDC-lake shape: hour-partitioned ingestion timestamps, a
    // consumer asking for one window — the plan's timestamp literals
    // must render at the session time zone and file-skip soundly
    val zone = freshZone("graft_btbl_ts")
    TxLog.replace(spark, zone,
      spark.range(96L).selectExpr("id AS k",
          "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts")
        .repartitionByRange(4, col("ts")),
      statsCols = Seq("ts"))
    val expect = TxLog.read(spark, zone)
      .filter(col("ts").between("2024-01-02 00:00:00", "2024-01-02 23:00:00"))
      .select("k").as[Long].collect().toSet
    assert(expect.nonEmpty)
    val got = load(zone)
      .filter(col("ts").between(
        lit("2024-01-02 00:00:00").cast("timestamp"),
        lit("2024-01-02 23:00:00").cast("timestamp")))
      .select("k").as[Long].collect().toSet
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(total === 4L)
    assert(served < total, s"one day of four must file-skip: $served/$total")
    assert(got === expect, "pruned timestamp-range read must equal full scan")
  }

  test("one-sided string ranges prune via the prefix-stat compare") {
    val zone = freshZone("graft_btbl_str")
    TxLog.replace(spark, zone,
      spark.range(100L).selectExpr("id AS k",
          "CONCAT('user-', LPAD(CAST(id AS STRING), 4, '0')) AS name")
        .repartitionByRange(4, col("name")),
      statsCols = Seq("name"))
    val expect = TxLog.read(spark, zone).filter(col("name") >= "user-0090")
      .select("k").as[Long].collect().toSet
    val got = load(zone).filter(col("name") >= "user-0090")
      .select("k").as[Long].collect().toSet
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(total === 4L)
    assert(served < total, s"the tail range must file-skip: $served/$total")
    assert(got === expect)
  }

  test("the snapshot is pinned at load: a later append does not change the frame") {
    val zone = rangeZone()
    val df = load(zone)
    assert(df.count() === 100L)
    TxLog.append(spark, zone, spark.range(1000L, 1100L).toDF("k"),
      statsCols = Seq("k"))
    assert(df.count() === 100L,
      "a loaded frame must keep reading its pinned generation")
    assert(load(zone).count() === 200L, "a fresh load sees the new head")
  }

  test("gen option time-travels within retention") {
    val zone = rangeZone()
    val g0 = TxLog.latest(spark, zone).get.gen
    TxLog.append(spark, zone, spark.range(1000L, 1100L).toDF("k"),
      statsCols = Seq("k"))
    val old = spark.read.format("txlog").option("zone", zone)
      .option("gen", g0.toString).load()
    assert(old.count() === 100L, "gen pin must serve the old generation")
    assert(old.agg(max(col("k"))).as[Long].first() === 99L)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("txlog").option("zone", zone)
        .option("gen", "999").load()
    }
    assert(e.getMessage.contains("generation 999"))
  }

  test("a zone without a log refuses loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_btbl_nolog").toString
    spark.range(5L).write.mode("overwrite").parquet(dir + "/zone")
    val e = intercept[IllegalArgumentException] {
      load(dir + "/zone").count()
    }
    assert(e.getMessage.contains("no transaction log"))
  }

  test("streaming still takes the v1 source path under the shared short name") {
    // the table declares BATCH_READ only, so readStream must fall back to
    // the v1 StreamSourceProvider — same short name, both engines
    val zone = rangeZone()
    val q = spark.readStream.format("txlog").option("zone", zone).load()
      .filter(col("k") < 25L)
      .writeStream.format("memory").queryName("btbl_stream").outputMode("append")
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("btbl_stream").as[Long].collect().toSet ===
      (0L until 25L).toSet)
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(served < total, "the streaming hook must still prune")
  }

  test("schema evolution: the batch table serves nulls for pre-evolution files") {
    val zone = freshZone("graft_btbl_evo")
    TxLog.replace(spark, zone, spark.range(3L).toDF("k"))
    TxLog.append(spark, zone,
      spark.range(3L, 6L).selectExpr("id AS k", "id * 10 AS extra"))
    val got = load(zone).orderBy("k")
      .as[(Long, Option[Long])].collect().toSeq
    assert(got === (0L until 6L).map(k =>
      (k, if (k < 3) None else Some(k * 10))),
      "old files must surface the evolved column as null")
  }

  test("limit pushdown: a .limit(3) batch preview opens one file, not the zone") {
    val zone = rangeZone()
    val all = TxLog.read(spark, zone).as[Long].collect().toSet
    val got = load(zone).limit(3).as[Long].collect().toSet
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(total === 4L)
    assert(served === 1L,
      s"3 rows fit the first committed file: $served/$total")
    assert(got.size === 3 && got.subsetOf(all),
      "the limited read must deliver exactly 3 real rows")
    // and the cap renders on the scan node for explain readers (the
    // BatchScan leaf prints the scan's description)
    val plan = load(zone).limit(3).queryExecution.executedPlan.toString
    assert(plan.contains("Limit: 3"),
      s"the capped scan must say so:\n$plan")
  }

  test("limit never reaches a filtered scan (residual Filter blocks the offer)") {
    val zone = rangeZone()
    val got = load(zone).filter(col("k") >= 10L).limit(5)
      .as[Long].collect().toSet
    assert(got.size === 5 && got.forall(_ >= 10L),
      "limit over filter must emit 5 rows all satisfying the predicate")
  }

  test("COUNT(*) is answered from the manifest: zero data files opened") {
    val zone = rangeZone()
    PushdownProbe.clear(s"txlog:$zone")
    val df = load(zone).agg(count(lit(1)).as("n"))
    assert(df.as[Long].head() === 100L)
    // complete pushdown: the one-row count relation replaced the data
    // scan, so TxLogPrunableScan.buildRDD never ran for this zone
    assert(PushdownProbe.get(s"txlog:$zone").isEmpty,
      "a manifest-served count must not open any data file")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [COUNT(*)]"),
      s"the plan must show the manifest-served aggregate:\n$plan")
  }

  test("plain SQL COUNT(*) over a registered view is manifest-served too") {
    val zone = rangeZone()
    load(zone).createOrReplaceTempView("btbl_cnt_sql")
    PushdownProbe.clear(s"txlog:$zone")
    assert(spark.sql("SELECT COUNT(*) AS n FROM btbl_cnt_sql")
      .as[Long].head() === 100L)
    assert(PushdownProbe.get(s"txlog:$zone").isEmpty,
      "the SQL form must take the same zero-data-files path")
  }

  test("COUNT(col) uses the committed null counts; COUNT(*) vs COUNT(col) differ") {
    val zone = freshZone("graft_btbl_cnt")
    // 2 files, tracked column v carries nulls in one of them
    TxLog.replace(spark, zone,
      spark.range(10L)
        .selectExpr("id AS k", "IF(id % 3 = 0, NULL, id) AS v")
        .repartitionByRange(2, col("k")),
      statsCols = Seq("k", "v"))
    PushdownProbe.clear(s"txlog:$zone")
    val row = load(zone)
      .agg(count(lit(1)).as("all"), count(col("v")).as("nn"))
      .as[(Long, Long)].head()
    assert(row === ((10L, 6L)),
      "COUNT(*) counts rows, COUNT(v) skips the committed nulls")
    assert(PushdownProbe.get(s"txlog:$zone").isEmpty,
      "both counts must come from the manifest, not a data scan")
  }

  test("vacuum vs time travel: within retention reads, past retention refuses at load") {
    val zone = freshZone("graft_btbl_vac")
    TxLog.replace(spark, zone, spark.range(5L).toDF("k"))
    val g1 = TxLog.latest(spark, zone).get.gen
    for (i <- 0 until 4)
      TxLog.replace(spark, zone, spark.range(5L * (i + 2)).toDF("k"))
    // pinned-before-vacuum reads the old generation fine
    assert(spark.read.format("txlog").option("zone", zone)
      .option("gen", g1).load().count() === 5L)
    TxLog.vacuum(spark, zone, keepGens = 2, graceMs = 0L)
    // past retention: the travel request refuses loudly AT LOAD — the
    // generation is unresolvable, not silently remapped to a newer one
    val e = intercept[IllegalArgumentException] {
      spark.read.format("txlog").option("zone", zone)
        .option("gen", g1).load()
    }
    assert(e.getMessage.contains("no resolvable generation"),
      s"vacuumed travel must refuse, got: ${e.getMessage}")
    // the head keeps reading
    assert(spark.read.format("txlog").option("zone", zone).load().count() === 25L)
  }

  test("asOfTimestamp time travel resolves by commit time (Delta's mtime rule)") {
    val zone = freshZone("graft_btbl_asof")
    TxLog.replace(spark, zone, spark.range(3L).toDF("k"))
    Thread.sleep(1100) // clear 1s-granularity mtime clocks on both sides
    val between = System.currentTimeMillis()
    Thread.sleep(1100)
    TxLog.append(spark, zone, spark.range(3L, 6L).toDF("k"))
    def asOf(v: String) = spark.read.format("txlog").option("zone", zone)
      .option("asOfTimestamp", v).load().as[Long].collect().toSet
    // epoch-millis form: between the two commits → the first generation
    assert(asOf(between.toString) === Set(0L, 1L, 2L),
      "a timestamp between commits must read the earlier one")
    // wall-clock form, session-zone (UTC-pinned suite)
    val wall = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(between), java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss"))
    assert(asOf(wall) === Set(0L, 1L, 2L),
      "the wall-clock string form must resolve at the session time zone")
    // now → head
    assert(asOf(System.currentTimeMillis().toString) === (0L until 6L).toSet)
    // before the zone existed → loud, specific error
    val e = intercept[IllegalArgumentException] { asOf("2000-01-01") }
    assert(e.getMessage.contains("younger"),
      s"too-early travel must say the zone is younger: ${e.getMessage}")
    // gen and asOfTimestamp together → refused
    intercept[IllegalArgumentException] {
      spark.read.format("txlog").option("zone", zone)
        .option("gen", "0").option("asOfTimestamp", between.toString).load()
    }
  }

  test("df.write.format(txlog) mode append lands transactional generations") {
    val zone = freshZone("graft_btbl_w")
    // first write CREATES the zone (no prior log needed)
    spark.range(5L).toDF("k").write.format("txlog")
      .option("zone", zone).mode("append").save()
    val g1 = TxLog.latest(spark, zone).get.gen
    spark.range(5L, 10L).toDF("k").write.format("txlog")
      .option("zone", zone).mode("append").save()
    assert(TxLog.latest(spark, zone).get.gen === g1 + 1L,
      "each writer append must claim exactly one generation")
    assert(load(zone).as[Long].collect().toSet === (0L until 10L).toSet)
    // time travel still sees the pre-append state: the writer went
    // through the same OCC publish as the API
    assert(spark.read.format("txlog").option("zone", zone)
      .option("gen", g1).load().as[Long].collect().toSet ===
      (0L until 5L).toSet)
  }

  test("mode overwrite replaces; statsCols option commits prunable stats") {
    val zone = freshZone("graft_btbl_wo")
    spark.range(100L).toDF("k").repartitionByRange(4, col("k"))
      .write.format("txlog").option("zone", zone).option("statsCols", "k")
      .mode("overwrite").save()
    // the committed stats must be immediately prunable by a plain read
    val got = load(zone).filter(col("k") < 25L).as[Long].collect().toSet
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(total === 4L && served <= 2L,
      s"writer-committed stats must prune: $served/$total")
    assert(got === (0L until 25L).toSet)
    // second overwrite replaces content wholesale
    spark.range(7L).toDF("k").write.format("txlog")
      .option("zone", zone).mode("overwrite").save()
    assert(load(zone).as[Long].collect().toSet === (0L until 7L).toSet)
  }

  test("save(path)/load(path) work as the zone alias") {
    val zone = freshZone("graft_btbl_wp")
    spark.range(3L).toDF("k").write.format("txlog").mode("append").save(zone)
    assert(spark.read.format("txlog").load(zone).as[Long].collect().toSet ===
      Set(0L, 1L, 2L))
  }

  test("schema evolution flows through the writer append") {
    val zone = freshZone("graft_btbl_wevo")
    spark.range(3L).toDF("k").write.format("txlog")
      .option("zone", zone).mode("append").save()
    spark.range(3L, 6L).selectExpr("id AS k", "id * 10 AS extra")
      .write.format("txlog").option("zone", zone).mode("append").save()
    val got = load(zone).orderBy("k").as[(Long, Option[Long])].collect().toSeq
    assert(got === (0L until 6L).map(k =>
      (k, if (k < 3) None else Some(k * 10))),
      "writer-path evolution must match the API path's null-fill")
  }

  test("ErrorIfExists/Ignore modes are refused with guidance toward append/overwrite") {
    val zone = freshZone("graft_btbl_we")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(3L).toDF("k").write.format("txlog")
        .option("zone", zone).save() // default mode = ErrorIfExists
    }
    assert(e.getMessage.toLowerCase.contains("append") ||
      e.getMessage.toLowerCase.contains("overwrite"),
      s"the refusal must name the supported modes: ${e.getMessage}")
  }

  test("COUNT declines honestly: untracked column, filter, group-by all full-scan") {
    val zone = rangeZone() // tracks only k; file stats exist for k alone
    // an untracked column's null count is unknowable from the manifest
    val zone2 = freshZone("graft_btbl_cnt_dec")
    TxLog.replace(spark, zone2,
      spark.range(8L).selectExpr("id AS k", "IF(id % 2 = 0, NULL, id) AS v"),
      statsCols = Seq("k"))
    assert(load(zone2).agg(count(col("v"))).as[Long].head() === 4L,
      "COUNT of an untracked column must fall back to a real scan, correct")
    // a residual predicate blocks aggregate pushdown entirely
    assert(load(zone).filter(col("k") < 25L).agg(count(lit(1)))
      .as[Long].head() === 25L)
    // group-by is never manifest-served
    assert(load(zone).groupBy((col("k") % 2).as("p")).agg(count(lit(1)).as("n"))
      .orderBy("p").as[(Long, Long)].collect().toSeq ===
      Seq((0L, 50L), (1L, 50L)))
    // MIN/MAX are declined by design (stat encodings widen), still exact
    assert(load(zone).agg(min(col("k")), max(col("k")))
      .as[(Long, Long)].head() === ((0L, 99L)))
  }

  test("committed per-file sizes cover every live file across commit kinds") {
    // Round-11 directive #4: every commit path stamps (bytes, mtime) into
    // the manifest, so scan planning needs zero per-file FS RPCs. Walk a
    // zone through replace -> append -> delete -> compact -> restore and
    // pin full sizes coverage with lengths matching the filesystem at
    // every step.
    val zone = freshZone("graft_sizes")
    def check(tag: String): Unit = {
      val head = TxLog.latest(spark, zone).get
      assert(head.files.forall(head.sizes.contains),
        s"$tag: sizes must cover all ${head.files.size} files; " +
          s"missing ${head.files.filterNot(head.sizes.contains)}")
      val fs = new org.apache.hadoop.fs.Path(zone)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      head.files.foreach { rel =>
        val real = fs.getFileStatus(
          new org.apache.hadoop.fs.Path(zone + "/" + rel)).getLen
        assert(head.sizes(rel)._1 === real,
          s"$tag: committed byte length of $rel must match the filesystem")
      }
    }
    TxLog.replace(spark, zone,
      spark.range(100L).toDF("k").repartitionByRange(4, col("k")),
      statsCols = Seq("k"))
    check("replace")
    TxLog.append(spark, zone, spark.range(100L, 120L).toDF("k"))
    check("append")
    TxLog.deleteWhereFiles(spark, zone, h => h.files, df => df("k") >= 110L)
    check("delete")
    TxLog.compact(spark, zone, targetBytes = 1L << 30)
    check("compact")
    TxLog.restore(spark, zone, TxLog.latest(spark, zone).get.gen - 1)
    check("restore")
    assert(load(zone).count() === 110L)
  }

  test("plan partitions are manifest-served: a sized file plans without touching the FS") {
    // The committed sizes make planning FS-free: a file entry whose
    // bytes are in the manifest yields an InputPartition even when the
    // file is NOT where the filesystem can see it (mocked/missing-mtime
    // case) -- the pre-sizes fallback would need a directory listing.
    val zone = freshZone("graft_sizes_plan")
    TxLog.replace(spark, zone, spark.range(10L).toDF("k"))
    val parts = graft.sources.TxLogBatchScan.filePartitions(
      spark, zone, Seq("d-nowhere/ghost.parquet"),
      sizes = Map("d-nowhere/ghost.parquet" -> ((1234L, 0L))))
    assert(parts.length === 1, "a manifest-sized file must plan FS-free")
    val p = parts.head.asInstanceOf[graft.sources.TxLogFilePartition]
    assert(p.length === 1234L && p.path.endsWith("d-nowhere/ghost.parquet"))
    // pre-sizes manifests (empty sizes) still plan via the listing path
    val head = TxLog.latest(spark, zone).get
    val legacy = graft.sources.TxLogBatchScan.filePartitions(
      spark, zone, head.files, sizes = Map.empty)
    assert(legacy.length === head.files.size,
      "the pre-sizes listing fallback must still serve every file")
  }

  test("sizes survive the delta/checkpoint round trip and drop with removed files") {
    val zone = freshZone("graft_sizes_rt")
    TxLog.replace(spark, zone, spark.range(20L).toDF("k"),
      statsCols = Seq("k"))
    // enough delta commits to cross a checkpoint boundary
    (0 until 12).foreach(i =>
      TxLog.append(spark, zone, Seq(100L + i).toDF("k")))
    val head = TxLog.latest(spark, zone).get
    assert(head.files.forall(head.sizes.contains),
      "sizes must survive delta folding across a checkpoint")
    val before = head.files.toSet
    TxLog.compact(spark, zone, targetBytes = 1L << 30)
    val after = TxLog.latest(spark, zone).get
    assert(after.sizes.keySet === after.files.toSet,
      "removed files' size entries must drop with them")
    assert(after.files.toSet.intersect(before).isEmpty)
  }
}
