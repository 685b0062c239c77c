package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamDedup

object StreamDedupSpec {
  case class Doc(docId: Long, ts: Timestamp, text: String)
}

/** Streaming LSH near-dup first-seen filter == its batch twin on a
  * q37-shape fixture, claims survive a checkpoint restart, and state is
  * bounded by the watermark horizon (expired bands become claimable). */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._
  import StreamDedupSpec.Doc

  private def t(ms: Long) = new Timestamp(ms)

  // base docs are mutually distinct; 11 and 21 are near-copies of 1 and 2
  // (identical/one-token-edited -> shared bands), 31 is novel
  private val base = Seq(
    Doc(1L, t(1000), "alpha beta gamma delta epsilon zeta"),
    Doc(2L, t(2000), "one two three four five six seven"),
    Doc(3L, t(3000), "red green blue yellow purple orange"))
  private val later = Seq(
    Doc(11L, t(4000), "alpha beta gamma delta epsilon zeta"),
    Doc(21L, t(5000), "one two three four five six EDIT"),
    Doc(31L, t(6000), "totally different words appear right here"))

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

  test("stream first-seen == batch twin on a near-dup fixture") {
    implicit val sq = spark.sqlContext
    val got = withRocksDb {
      val mem = MemoryStream[Doc]
      val q = StreamDedup.bandVerdicts(mem.toDF(), "docId", "ts", "text",
          lateness = "10 seconds", horizonMs = 3600L * 1000L)
        .writeStream.format("memory").queryName("sdv").outputMode("append").start()
      mem.addData(base); q.processAllAvailable()
      mem.addData(later); q.processAllAvailable()
      q.stop()
      StreamDedup.firstSeen(spark.table("sdv"))
        .as[(Long, Long)].collect().toSet
    }
    val batch = StreamDedup.firstSeenBatch(
        (base ++ later).toDF(), "docId", "ts", "text")
      .as[(Long, Long)].collect().toSet
    assert(got === batch, s"stream $got vs batch $batch")
    val ids = got.map(_._1)
    // the exact copy is a duplicate; the novel doc survives
    assert(!ids.contains(11L), "an identical later doc must be filtered")
    assert(ids.contains(31L) && ids.contains(1L) && ids.contains(2L) && ids.contains(3L))
  }

  test("claims survive a checkpoint restart (the dup arrives after the restart)") {
    withRocksDb {
      val src = java.nio.file.Files.createTempDirectory("sdsrc").toString
      val ckpt = java.nio.file.Files.createTempDirectory("sdckpt").toString
      val out = java.nio.file.Files.createTempDirectory("sdout").toString + "/v"

      def writeBatch(rows: Seq[Doc]): Unit =
        rows.toDS().coalesce(1).write.mode("append").json(src)

      def runOnce(): Unit = {
        val stream = spark.readStream
          .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
          .json(src)
        val q = StreamDedup.bandVerdicts(stream, "docId", "ts", "text",
            lateness = "10 seconds", horizonMs = 3600L * 1000L)
          .writeStream.outputMode("append")
          .foreachBatch { (ds: org.apache.spark.sql.Dataset[StreamDedup.BandVerdict],
                           _: Long) =>
            ds.write.mode("append").parquet(out): Unit
          }
          .option("checkpointLocation", ckpt).start()
        q.processAllAvailable(); q.stop()
      }

      writeBatch(base); runOnce()
      writeBatch(later); runOnce() // full restart from checkpoint
      val ids = StreamDedup.firstSeen(spark.read.parquet(out))
        .select("doc_id").as[Long].collect().toSet
      // doc 1's band claims live only in the pre-restart store: the
      // post-restart identical doc 11 must still be filtered by them
      assert(!ids.contains(11L), "restart lost the pre-restart band claims")
      assert(ids === Set(1L, 2L, 3L, 21L, 31L).filter(i =>
          StreamDedup.firstSeenBatch((base ++ later).toDF(), "docId", "ts", "text")
            .select("doc_id").as[Long].collect().toSet.contains(i)),
        "stream after restart diverged from the batch twin")
    }
  }

  test("state is bounded by the horizon: expired bands become claimable again") {
    implicit val sq = spark.sqlContext
    withRocksDb {
      val mem = MemoryStream[Doc]
      // tiny horizon (5 s), zero lateness: claims expire quickly
      val q = StreamDedup.bandVerdicts(mem.toDF(), "docId", "ts", "text",
          lateness = "0 seconds", horizonMs = 5000L)
        .writeStream.format("memory").queryName("sdexp").outputMode("append").start()
      mem.addData(Seq(Doc(1L, t(1000), "alpha beta gamma delta epsilon zeta")))
      q.processAllAvailable()
      // advance the watermark far past claim+horizon (two hops so the
      // timer fires strictly before the re-claim batch is processed)
      mem.addData(Seq(Doc(90L, t(100000), "w1 w2 w3 w4 w5 w6")))
      q.processAllAvailable()
      mem.addData(Seq(Doc(91L, t(200000), "v1 v2 v3 v4 v5 v6")))
      q.processAllAvailable()
      // same text as doc 1, far outside the horizon: first-seen AGAIN
      mem.addData(Seq(Doc(99L, t(300000), "alpha beta gamma delta epsilon zeta")))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      q.stop()
      val ids = StreamDedup.firstSeen(spark.table("sdexp"))
        .select("doc_id").as[Long].collect().toSet
      assert(ids.contains(99L),
        "an expired claim must not suppress a doc a full horizon later")
      // state holds at most the in-horizon claims (16 bands/doc, ~2 docs
      // in flight), nowhere near the 4x16 total bands ever seen
      assert(stateRows <= 48L, s"state grew past the horizon bound: $stateRows")
    }
  }

  test("containment cap-scope class: batch's corpus-global df cap drops a doc no arrival-prefix scope can") {
    // The sf3 attribution's second irreducible class (round 16): the
    // batch tier caps shingles by their FINAL corpus df — a statistic
    // that includes arrivals AFTER the doc the stream must rule on.
    // Fixture: B's rare shingles are contained in the earlier A at
    // 28/30 = 0.933, but B also carries hot shingle (h1 h2 h3) whose
    // corpus df is 3 (> cap 2) only because E and F arrive LATER. Batch
    // (cap 2) excludes the hot shingle -> 0.933 >= t drops B; the
    // stream at B's arrival has seen zero h-instances, counts it ->
    // 28/31 = 0.903 < t keeps B. The UNCAPPED ratio is also 0.903, so
    // no arrival-prefix cap scope can mirror the batch verdict — the
    // divergence needs the future, not a better tier.
    implicit val sq = spark.sqlContext
    val ts = 0.92
    val aToks = (1 to 32).map(i => s"a$i")
    val docs = Seq(
      Doc(1L, t(1000), aToks.mkString(" ")),
      Doc(2L, t(2000), (aToks.take(30) ++ Seq("h1", "h2", "h3")).mkString(" ")),
      Doc(3L, t(3000), "e1 e2 h1 h2 h3 e3 e4"),
      Doc(4L, t(4000), "f1 f2 h1 h2 h3 f3 f4"))
    import graft.operators.Dedup
    val capped = Dedup.pairStats(docs.toDF(), "docId", "text", n = 3,
      maxShingleDf = 2L)
    val cb = round(col("inter").cast("double") / col("n_b"), 4)
    val batchDrops = capped
      .filter(col("a_id") === 1L && col("b_id") === 2L && cb >= ts).count()
    assert(batchDrops === 1L, "the capped batch metric must drop B (0.933 >= t)")
    val uncapped = Dedup.pairStats(docs.toDF(), "docId", "text", n = 3)
      .filter(col("a_id") === 1L && col("b_id") === 2L && cb >= ts).count()
    assert(uncapped === 0L, "the uncapped ratio (0.903) must NOT reach t")
    val suppressed = withRocksDb {
      val mem = MemoryStream[Doc]
      val q = StreamDedup.containmentMatches(mem.toDF(), "docId", "ts",
          "text", lateness = "10 seconds", horizonMs = 3600L * 1000L,
          n = 3, dfCap = 2)
        .toDF()
        .writeStream.format("memory").queryName("sdcap").outputMode("append").start()
      mem.addData(docs); q.processAllAvailable()
      q.stop()
      StreamDedup.containmentSuppressed(spark.table("sdcap"), ts)
        .select("doc_id").as[Long].collect().toSet
    }
    assert(suppressed === Set.empty[Long],
      s"the stream (arrival-prefix cap) keeps B — pinned cap-scope class: $suppressed")
  }
}
