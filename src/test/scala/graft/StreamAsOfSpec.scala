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
