package graft

import org.apache.spark.sql.functions._
import graft.streaming.{AsOfJoined, AsOfProbe, AsOfRef, StreamAsOf}

/** The stream-stream as-of join must produce exactly the batch
  * AsOf.joinLatest rows on the q54 fixture (views = references,
  * purchases = probes, per user), with watermark-bounded state:
  * inclusive at-or-before semantics, greatest-seq ties, and a
  * null-valued reference shadowing older values. */
class StreamAsOfSpec extends SparkSpec {

  private def runStream(refBatches: Seq[Seq[AsOfRef]],
                        probeBatches: Seq[Seq[AsOfProbe]],
                        name: String): Seq[AsOfJoined] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val refMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AsOfRef]
    val probeMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AsOfProbe]
    val q = StreamAsOf.joinLatest(probeMem.toDS(), refMem.toDS(), "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try refBatches.zipAll(probeBatches, Seq.empty[AsOfRef], Seq.empty[AsOfProbe])
      .foreach { case (rb, pb) =>
        if (rb.nonEmpty) refMem.addData(rb)
        if (pb.nonEmpty) probeMem.addData(pb)
        q.processAllAvailable()
      }
    finally q.stop()
    spark.table(name).as[AsOfJoined].collect().toSeq
  }

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("matches batch AsOf.joinLatest on the sf0.001 q54 fixture") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sf0001)
    val refsDf = events.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id", $"value")
    val probesDf = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")

    val want = graft.operators.AsOf
      .joinLatest(probesDf, refsDf, Seq("user_id"), "ts", "event_id", "value")
      .select($"user_id", $"event_id", $"value", $"asof_value")
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq.sorted

    val refs = refsDf.select($"user_id".as("key"), $"ts",
      $"event_id".as("seq"), $"value".as("ref_value")).as[AsOfRef].collect().toSeq
    val probes = probesDf.select($"user_id".as("key"), $"ts",
      $"event_id".as("seq"), $"value").as[AsOfProbe].collect().toSeq
    assert(refs.nonEmpty && probes.nonEmpty)

    // flush: one far-future sentinel per key on BOTH streams (the union's
    // watermark is the per-stream minimum), seq = -1 to filter afterwards
    val flushTs = ts(refs.map(r => StreamAsOf.micros(r.ts) / 1000000L).max + 365L * 86400L)
    val keys = (refs.map(_.key) ++ probes.map(_.key)).distinct
    val got = runStream(
      Seq(refs, keys.map(AsOfRef(_, flushTs, -1L, None))),
      Seq(probes, keys.map(AsOfProbe(_, flushTs, -1L, None))),
      "asof_equiv")
      .filter(_.seq >= 0L)
      .map(j => (j.key, j.seq, j.value, j.asof_value)).sorted
    assert(got === want)
  }

  test("probes flush on watermark advance; anchor survives eviction; inclusive semantics") {
    // triggers: (1) two refs; (2) a pending probe ABOVE the watermark;
    // (3) a newer ref advances the ref-stream watermark past the probe —
    // it must join the trigger-1 anchor (v=20), not the newer ref
    // (the trailing far-future probe advances the probe-side watermark —
    // the union watermark is the stream minimum — and itself stays pending)
    val got = runStream(
      Seq(Seq(AsOfRef(1L, ts(100), 1L, Some(10.0)), AsOfRef(1L, ts(200), 2L, Some(20.0))),
          Seq.empty,
          Seq(AsOfRef(1L, ts(400), 4L, Some(40.0)))),
      Seq(Seq.empty,
          Seq(AsOfProbe(1L, ts(300), 3L, Some(1.0))),
          Seq(AsOfProbe(1L, ts(2000), -1L, None))),
      "asof_anchor")
    assert(got.map(j => (j.key, j.seq, j.asof_value)) === Seq((1L, 3L, Some(20.0))))
  }

  test("a null-valued reference shadows older non-null values") {
    val got = runStream(
      Seq(Seq(AsOfRef(7L, ts(100), 1L, Some(10.0)), AsOfRef(7L, ts(200), 2L, None)),
          Seq(AsOfRef(7L, ts(1000), 9L, Some(99.0)))),
      Seq(Seq(AsOfProbe(7L, ts(250), 3L, Some(1.0))),
          Seq(AsOfProbe(7L, ts(2000), -1L, None))),
      "asof_nullref")
    assert(got.map(j => (j.key, j.seq, j.asof_value)) === Seq((7L, 3L, None)))
  }

  test("a probe with no preceding reference emits null") {
    val got = runStream(
      Seq(Seq(AsOfRef(2L, ts(500), 5L, Some(5.0))),
          Seq(AsOfRef(2L, ts(900), 9L, Some(9.0)))),
      Seq(Seq(AsOfProbe(2L, ts(400), 1L, Some(1.0))),
          Seq(AsOfProbe(2L, ts(2000), -1L, None))),
      "asof_norefs")
    assert(got.map(j => (j.key, j.seq, j.asof_value)) === Seq((2L, 1L, None)))
  }
}

/** The FORWARD stream-stream as-of join must produce exactly the batch
  * AsOf.joinNext rows on the q149 fixture (purchases pick up the next
  * view at-or-after their time, lowest-seq ties), including across a
  * checkpoint restart, with horizon-bounded null emission. */
class StreamAsOfNextSpec extends SparkSpec {

  private val HorizonMs = 90L * 86400L * 1000L // 90 days >> the 30-day fixture span

  private def runStream(refBatches: Seq[Seq[AsOfRef]],
                        probeBatches: Seq[Seq[AsOfProbe]],
                        name: String): Seq[AsOfJoined] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val refMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AsOfRef]
    val probeMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AsOfProbe]
    val q = StreamAsOf.joinNext(probeMem.toDS(), refMem.toDS(), "0 seconds", HorizonMs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try refBatches.zipAll(probeBatches, Seq.empty[AsOfRef], Seq.empty[AsOfProbe])
      .foreach { case (rb, pb) =>
        if (rb.nonEmpty) refMem.addData(rb)
        if (pb.nonEmpty) probeMem.addData(pb)
        q.processAllAvailable()
      }
    finally q.stop()
    spark.table(name).as[AsOfJoined].collect().toSeq
  }

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def fixture() = {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sf0001)
    val refsDf = events.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id", $"value")
    val probesDf = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")
    val want = graft.operators.AsOf
      .joinNext(probesDf, refsDf, Seq("user_id"), "ts", "event_id", "value")
      .select($"user_id", $"event_id", $"value", $"asof_value")
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq.sorted
    val refs = refsDf.select($"user_id".as("key"), $"ts",
      $"event_id".as("seq"), $"value".as("ref_value")).as[AsOfRef].collect().toSeq
    val probes = probesDf.select($"user_id".as("key"), $"ts",
      $"event_id".as("seq"), $"value").as[AsOfProbe].collect().toSeq
    (refs, probes, want)
  }

  /** Far-future flush sentinels: outside every real probe's horizon, so
    * they advance the watermark without becoming anyone's next match. */
  private def flushTsOf(refs: Seq[AsOfRef]): java.sql.Timestamp =
    ts(refs.map(r => StreamAsOf.micros(r.ts) / 1000000L).max + 400L * 86400L)

  test("matches batch AsOf.joinNext on the sf0.001 q149 fixture") {
    val (refs, probes, want) = fixture()
    assert(refs.nonEmpty && probes.nonEmpty)
    val flushTs = flushTsOf(refs)
    val keys = (refs.map(_.key) ++ probes.map(_.key)).distinct
    val got = runStream(
      Seq(refs, keys.map(AsOfRef(_, flushTs, -1L, None))),
      Seq(probes, keys.map(AsOfProbe(_, flushTs, -1L, None))),
      "asofn_equiv")
      .filter(_.seq >= 0L)
      .map(j => (j.key, j.seq, j.value, j.asof_value)).sorted
    assert(got === want)
  }

  test("q149 fixture across a checkpoint restart == batch joinNext") {
    import spark.implicits._
    val (refs, probes, want) = fixture()
    val flushTs = flushTsOf(refs)
    val keys = (refs.map(_.key) ++ probes.map(_.key)).distinct
    val cut = StreamAsOf.micros(refs.map(_.ts).sortBy(StreamAsOf.micros).apply(refs.size / 2))
    def half[T](xs: Seq[T], us: T => Long, first: Boolean) =
      xs.filter(x => (us(x) <= cut) == first)
    val srcR = java.nio.file.Files.createTempDirectory("asofnr").toString
    val srcP = java.nio.file.Files.createTempDirectory("asofnp").toString
    val ckpt = java.nio.file.Files.createTempDirectory("asofnc").toString
    val out = java.nio.file.Files.createTempDirectory("asofno").toString + "/t"
    def writeRefs(rs: Seq[AsOfRef]): Unit =
      rs.toDS().coalesce(1).write.mode("append").json(srcR)
    def writeProbes(ps: Seq[AsOfProbe]): Unit =
      ps.toDS().coalesce(1).write.mode("append").json(srcP)
    def runOnce(): Unit = {
      val rSchema = org.apache.spark.sql.Encoders.product[AsOfRef].schema
      val pSchema = org.apache.spark.sql.Encoders.product[AsOfProbe].schema
      val rStream = spark.readStream.schema(rSchema).json(srcR).as[AsOfRef]
      val pStream = spark.readStream.schema(pSchema).json(srcP).as[AsOfProbe]
      val q = StreamAsOf.joinNext(pStream, rStream, "0 seconds", HorizonMs)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    writeRefs(half[AsOfRef](refs, r => StreamAsOf.micros(r.ts), first = true))
    writeProbes(half[AsOfProbe](probes, p => StreamAsOf.micros(p.ts), first = true))
    runOnce()
    writeRefs(half[AsOfRef](refs, r => StreamAsOf.micros(r.ts), first = false) ++
      keys.map(AsOfRef(_, flushTs, -1L, None)))
    writeProbes(half[AsOfProbe](probes, p => StreamAsOf.micros(p.ts), first = false) ++
      keys.map(AsOfProbe(_, flushTs, -1L, None)))
    runOnce() // full restart from the checkpoint
    val got = spark.read.parquet(out).as[AsOfJoined].collect().toSeq
      .filter(_.seq >= 0L)
      .map(j => (j.key, j.seq, j.value, j.asof_value)).sorted
    assert(got === want, "restart changed the forward as-of output")
  }

  test("inclusive equal-ts match with lowest-seq tie; nearest wins over later") {
    val got = runStream(
      Seq(Seq(AsOfRef(1L, ts(300), 9L, Some(90.0)), AsOfRef(1L, ts(300), 2L, Some(20.0)),
              AsOfRef(1L, ts(500), 5L, Some(50.0))),
          Seq(AsOfRef(1L, ts(100000), -1L, None))),
      Seq(Seq(AsOfProbe(1L, ts(300), 3L, Some(1.0))),
          Seq(AsOfProbe(1L, ts(100000), -1L, None))),
      "asofn_tie")
    // equal ts qualifies (inclusive); among equal-ts refs the LOWEST seq
    // wins (the batch operator's order); the ts=500 ref never shadows
    assert(got.filter(_.seq >= 0).map(j => (j.key, j.seq, j.asof_value))
      === Seq((1L, 3L, Some(20.0))))
  }

  test("a ref-only key's joinNext state drains to empty once the watermark passes its refs") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val refMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AsOfRef]
    val probeMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AsOfProbe]
    val q = StreamAsOf.joinNext(probeMem.toDS(), refMem.toDS(), "0 seconds", HorizonMs)
      .writeStream.format("memory").queryName("asofn_drain")
      .outputMode("append").start()
    try {
      // key 9 receives references but never a probe — without a timeout
      // registered for it, its state would live forever
      refMem.addData(Seq(AsOfRef(9L, ts(10), 1L, Some(1.0)),
        AsOfRef(9L, ts(20), 2L, Some(2.0)),
        // key 8's probe gets an in-horizon match so IT finalizes and
        // leaves state — the residue under test is key 9 alone
        AsOfRef(8L, ts(16), 3L, Some(3.0))))
      probeMem.addData(Seq(AsOfProbe(8L, ts(15), 1L, Some(0.0))))
      q.processAllAvailable()
      // advance both streams' watermarks far past key 9's refs (and past
      // key 8's horizon), across two triggers so the event-time timeouts
      // registered at the old watermark get a batch to fire in
      refMem.addData(Seq(AsOfRef(7L, ts(1000000L), -1L, None)))
      probeMem.addData(Seq(AsOfProbe(7L, ts(1000000L), -1L, None)))
      q.processAllAvailable()
      refMem.addData(Seq(AsOfRef(7L, ts(1000010L), -2L, None)))
      probeMem.addData(Seq(AsOfProbe(7L, ts(1000010L), -2L, None)))
      q.processAllAvailable()
      // only the sentinel key's own in-horizon state may remain: key 9
      // (ref-only) and key 8 (probe finalized, no refs) must be gone
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 1L,
        s"ref-only key state leaked: $stateRows state rows remain")
    } finally q.stop()
  }

  test("a probe with no next reference within the horizon emits null") {
    // the only later ref is beyond the horizon end; once the watermark
    // passes probe.ts + horizon the probe finalizes with null
    val horizonSec = HorizonMs / 1000L
    val got = runStream(
      Seq(Seq(AsOfRef(4L, ts(100), 1L, Some(10.0))),
          Seq(AsOfRef(4L, ts(200 + horizonSec + 100), 7L, Some(70.0))),
          Seq(AsOfRef(4L, ts(3L * horizonSec), -1L, None))),
      Seq(Seq(AsOfProbe(4L, ts(200), 2L, Some(1.0))),
          Seq.empty,
          Seq(AsOfProbe(4L, ts(3L * horizonSec), -1L, None))),
      "asofn_null")
    assert(got.filter(_.seq >= 0).map(j => (j.key, j.seq, j.asof_value))
      === Seq((4L, 2L, None)))
  }
}

/** The NEAREST stream-stream as-of join must produce exactly the batch
  * AsOf.joinNearest rows on the q171 fixture (views = references,
  * purchases = probes, per user), including across a checkpoint restart,
  * with the prev-on-tie rule and horizon-bounded forward resolution. */
class StreamAsOfNearestSpec extends SparkSpec {
  import graft.streaming.AsOfNearest

  private val HorizonMs = 90L * 86400L * 1000L // 90 days >> the fixture span

  private def runStream(refBatches: Seq[Seq[AsOfRef]],
                        probeBatches: Seq[Seq[AsOfProbe]],
                        name: String): Seq[AsOfNearest] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val refMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AsOfRef]
    val probeMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AsOfProbe]
    val q = StreamAsOf.joinNearest(probeMem.toDS(), refMem.toDS(), "0 seconds", HorizonMs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try refBatches.zipAll(probeBatches, Seq.empty[AsOfRef], Seq.empty[AsOfProbe])
      .foreach { case (rb, pb) =>
        if (rb.nonEmpty) refMem.addData(rb)
        if (pb.nonEmpty) probeMem.addData(pb)
        q.processAllAvailable()
      }
    finally q.stop()
    spark.table(name).as[AsOfNearest].collect().toSeq
  }

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def fixture() = {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sf0001)
    val refsDf = events.filter($"event_type" === "view")
      .select($"user_id", $"ts", $"event_id", $"value")
    val probesDf = events.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")
    val wantRows = graft.operators.AsOf
      .joinNearest(probesDf, refsDf, Seq("user_id"), "ts", "event_id", "value")
      .select($"user_id", $"event_id", $"value",
        $"nearest_side", $"nearest_value", $"nearest_delta_us")
      .as[(Long, Long, Option[Double], String, Option[Double], Option[Long])]
      .collect().toSeq
    // batch == stream only when every forward win fits the horizon
    assert(wantRows.filter(_._4 == "next").flatMap(_._6)
      .forall(_ < HorizonMs * 1000L), "fixture violates the horizon precondition")
    val refs = refsDf.select($"user_id".as("key"), $"ts",
      $"event_id".as("seq"), $"value".as("ref_value")).as[AsOfRef].collect().toSeq
    val probes = probesDf.select($"user_id".as("key"), $"ts",
      $"event_id".as("seq"), $"value").as[AsOfProbe].collect().toSeq
    (refs, probes, wantRows.sorted)
  }

  private def flushTsOf(refs: Seq[AsOfRef]): java.sql.Timestamp =
    ts(refs.map(r => StreamAsOf.micros(r.ts) / 1000000L).max + 400L * 86400L)

  test("matches batch AsOf.joinNearest on the sf0.001 q171 fixture") {
    val (refs, probes, want) = fixture()
    assert(refs.nonEmpty && probes.nonEmpty)
    val flushTs = flushTsOf(refs)
    val keys = (refs.map(_.key) ++ probes.map(_.key)).distinct
    val got = runStream(
      Seq(refs, keys.map(AsOfRef(_, flushTs, -1L, None))),
      Seq(probes, keys.map(AsOfProbe(_, flushTs, -1L, None))),
      "asofnr_equiv")
      .filter(_.seq >= 0L)
      .map(j => (j.key, j.seq, j.value, j.side, j.nearest_value, j.delta_us)).sorted
    assert(got === want)
  }

  test("q171 fixture across a checkpoint restart == batch joinNearest") {
    import spark.implicits._
    val (refs, probes, want) = fixture()
    val flushTs = flushTsOf(refs)
    val keys = (refs.map(_.key) ++ probes.map(_.key)).distinct
    val cut = StreamAsOf.micros(refs.map(_.ts).sortBy(StreamAsOf.micros).apply(refs.size / 2))
    def half[T](xs: Seq[T], us: T => Long, first: Boolean) =
      xs.filter(x => (us(x) <= cut) == first)
    val srcR = java.nio.file.Files.createTempDirectory("asofnrr").toString
    val srcP = java.nio.file.Files.createTempDirectory("asofnrp").toString
    val ckpt = java.nio.file.Files.createTempDirectory("asofnrc").toString
    val out = java.nio.file.Files.createTempDirectory("asofnro").toString + "/t"
    // parquet sources, NOT json: the default json timestamp format is
    // millisecond-precision and the nearest join's delta_us is micro-exact
    def writeRefs(rs: Seq[AsOfRef]): Unit =
      rs.toDS().coalesce(1).write.mode("append").parquet(srcR)
    def writeProbes(ps: Seq[AsOfProbe]): Unit =
      ps.toDS().coalesce(1).write.mode("append").parquet(srcP)
    def runOnce(): Unit = {
      val rSchema = org.apache.spark.sql.Encoders.product[AsOfRef].schema
      val pSchema = org.apache.spark.sql.Encoders.product[AsOfProbe].schema
      val rStream = spark.readStream.schema(rSchema).parquet(srcR).as[AsOfRef]
      val pStream = spark.readStream.schema(pSchema).parquet(srcP).as[AsOfProbe]
      val q = StreamAsOf.joinNearest(pStream, rStream, "0 seconds", HorizonMs)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    writeRefs(half[AsOfRef](refs, r => StreamAsOf.micros(r.ts), first = true))
    writeProbes(half[AsOfProbe](probes, p => StreamAsOf.micros(p.ts), first = true))
    runOnce()
    writeRefs(half[AsOfRef](refs, r => StreamAsOf.micros(r.ts), first = false) ++
      keys.map(AsOfRef(_, flushTs, -1L, None)))
    writeProbes(half[AsOfProbe](probes, p => StreamAsOf.micros(p.ts), first = false) ++
      keys.map(AsOfProbe(_, flushTs, -1L, None)))
    runOnce() // full restart from the checkpoint
    val got = spark.read.parquet(out).as[AsOfNearest].collect().toSeq
      .filter(_.seq >= 0L)
      .map(j => (j.key, j.seq, j.value, j.side, j.nearest_value, j.delta_us)).sorted
    assert(got === want, "restart changed the nearest as-of output")
  }

  test("joinNearest state converges to one anchor per ref-bearing key") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val refMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AsOfRef]
    val probeMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AsOfProbe]
    val q = StreamAsOf.joinNearest(probeMem.toDS(), refMem.toDS(), "0 seconds", HorizonMs)
      .writeStream.format("memory").queryName("asofnr_drain")
      .outputMode("append").start()
    try {
      // key 9: refs only, never a probe; key 8: a finalized probe whose
      // pinned prev must not outlive it. Eviction must collapse each
      // key's refs to ONE anchor and leak no pending probes.
      refMem.addData(Seq(AsOfRef(9L, ts(10), 1L, Some(1.0)),
        AsOfRef(9L, ts(20), 2L, Some(2.0)),
        AsOfRef(8L, ts(14), 3L, Some(3.0)), AsOfRef(8L, ts(16), 4L, Some(4.0))))
      probeMem.addData(Seq(AsOfProbe(8L, ts(15), 1L, Some(0.0))))
      q.processAllAvailable()
      // two watermark advances so registered event-time timeouts fire
      refMem.addData(Seq(AsOfRef(7L, ts(400L * 86400L), -1L, None)))
      probeMem.addData(Seq(AsOfProbe(7L, ts(400L * 86400L), -1L, None)))
      q.processAllAvailable()
      refMem.addData(Seq(AsOfRef(7L, ts(400L * 86400L + 10L), -2L, None)))
      probeMem.addData(Seq(AsOfProbe(7L, ts(400L * 86400L + 10L), -2L, None)))
      q.processAllAvailable()
      // keys 7, 8, 9 each keep exactly their anchor (a future probe can
      // still join backward against it) — nothing else may remain
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 3L,
        s"joinNearest state leaked: $stateRows rows for 3 ref-bearing keys")
      // key 8's probe emitted with its nearest ref despite the eviction
      val got = spark.table("asofnr_drain").as[graft.streaming.AsOfNearest]
        .collect().filter(_.seq >= 0)
      // prev at 14 and next at 16 are both 1 s away -> tie to prev
      assert(got.map(j => (j.key, j.side, j.nearest_value)).toSeq ===
        Seq((8L, "prev", Some(3.0))), s"tie must pick prev: ${got.toSeq}")
    } finally q.stop()
  }

  test("equal-distance picks prev; exact-ts ref resolves without waiting for the horizon") {
    val got = runStream(
      // flush sentinels sit OUTSIDE the horizon of every real probe, so
      // they advance the watermark without becoming anyone's next match
      // (key 4 must resolve 'none' by horizon expiry, not match a sentinel)
      Seq(Seq(AsOfRef(1L, ts(95), 1L, Some(10.0)), AsOfRef(1L, ts(105), 2L, Some(20.0)),
              AsOfRef(2L, ts(100), 3L, Some(30.0)),
              AsOfRef(3L, ts(107), 4L, Some(40.0))),
          Seq(AsOfRef(1L, ts(400L * 86400L), -1L, None), AsOfRef(2L, ts(400L * 86400L), -1L, None),
              AsOfRef(3L, ts(400L * 86400L), -1L, None), AsOfRef(4L, ts(400L * 86400L), -1L, None))),
      Seq(Seq(AsOfProbe(1L, ts(100), 10L, Some(1.0)),  // tie 5s both ways -> prev
              AsOfProbe(2L, ts(100), 11L, Some(2.0)),  // exact-ts ref -> prev delta 0
              AsOfProbe(3L, ts(100), 12L, Some(3.0)),  // only next -> next
              AsOfProbe(4L, ts(100), 13L, Some(4.0))), // nothing -> none
          Seq(AsOfProbe(1L, ts(400L * 86400L), -1L, None))),
      "asofnr_tie")
    val byKey = got.filter(_.seq >= 0)
      .map(j => j.key -> ((j.side, j.nearest_value, j.delta_us))).toMap
    assert(byKey(1L) === (("prev", Some(10.0), Some(5000000L))),
      s"exact tie must pick the earlier view: ${byKey(1L)}")
    assert(byKey(2L) === (("prev", Some(30.0), Some(0L))), s"${byKey(2L)}")
    assert(byKey(3L) === (("next", Some(40.0), Some(7000000L))), s"${byKey(3L)}")
    assert(byKey(4L) === (("none", None, None)), s"${byKey(4L)}")
  }
}
