package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Similarity, TxLog}
import graft.streaming.StreamSemDedup

object StreamSemDedupSpec {
  case class EmbDoc(vec_id: Long, ts: Timestamp, embedding: Array[Float])
}

/** Streaming semantic dedup (round-13 directive #5) == its batch twin
  * ([[Similarity.semDedupKeep]]) on the LakePipelineSpec embedding
  * fixture, gated by the persistent ANN index's FROZEN quantizer;
  * verdicts survive a checkpoint restart; chain drops follow the batch
  * rule; state is bounded by the horizon. */
class StreamSemDedupSpec extends SparkSpec {
  import spark.implicits._
  import StreamSemDedupSpec.EmbDoc

  private def t(ms: Long) = new Timestamp(ms)

  // the LakePipelineSpec semantic fixture: ±1 hypercube-corner
  // embeddings (pairwise cosine ≤ 0.75) with doc 30 carrying doc 3's
  // EXACT embedding — the planted semantic twin only this tier catches
  private def emb(i: Long): Array[Float] = {
    val src = if (i == 30L) 3L else i
    Array.tabulate(8)(d =>
      if (d >= 6) 1.0f
      else if (((src >> d) & 1L) == 1L) 1.0f else -1.0f)
  }
  private def doc(i: Long): EmbDoc = EmbDoc(i, t(1000L * (i + 1)), emb(i))

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

  /** The frozen quantizer: a persistent index artifact built over the
    * fixture corpus — what the lake's streaming gate would load. */
  private def frozenCentroids(ids: Seq[Long]): Seq[(Long, Array[Float])] = {
    val base = java.nio.file.Files.createTempDirectory("ssd_idx").toString
    val embZone = s"$base/emb"
    TxLog.replace(spark, embZone,
      ids.map(i => (i, emb(i))).toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>").as("embedding")))
    AnnIndex.build(spark, s"$base/idx", embZone).centroids
  }

  test("stream verdicts == batch semDedupKeep on the lake fixture (frozen index quantizer)") {
    implicit val sq = spark.sqlContext
    val ids = 0L until 40L
    val cents = frozenCentroids(ids)
    val threshold = 0.95
    val got = withRocksDb {
      val mem = MemoryStream[EmbDoc]
      val q = StreamSemDedup.cellVerdicts(mem.toDF(), cents, threshold,
          lateness = "10 seconds", horizonMs = 3600L * 1000L)
        .writeStream.format("memory").queryName("ssdv").outputMode("append").start()
      // id order across two triggers: doc 3 arrives a trigger before its
      // twin 30 — the claim must live in cross-trigger state
      mem.addData(ids.take(20).map(doc)); q.processAllAvailable()
      mem.addData(ids.drop(20).map(doc)); q.processAllAvailable()
      q.stop()
      spark.table("ssdv").filter($"kept").select($"doc_id")
        .as[Long].collect().toSet
    }
    val batchDf = ids.map(i => (i, emb(i))).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val batch = Similarity.semDedupKeep(batchDf, threshold, cents)
      .filter($"kept" === 1).select($"vec_id").as[Long].collect().toSet
    assert(got === batch, s"stream $got vs batch $batch")
    assert(!got(30L) && got(3L),
      "the planted twin (higher id, later arrival) must drop; its twin survive")
    assert(got.size === 39)
  }

  test("chain drops follow the batch rule: a dropped doc still suppresses its chain") {
    implicit val sq = spark.sqlContext
    // one cell (single centroid), three vectors at angles 0/18°/36° in a
    // 2-plane: cos(a,b)=cos(b,c)≈0.951 ≥ 0.9, cos(a,c)≈0.809 < 0.9 — the
    // batch tier drops BOTH b and c (b, though dropped, suppresses c)
    def at(theta: Double, id: Long): EmbDoc = EmbDoc(id, t(1000L * (id + 1)),
      Array.tabulate(8)(d =>
        if (d == 0) math.cos(theta).toFloat
        else if (d == 1) math.sin(theta).toFloat else 0.0f))
    val rows = Seq(at(0.0, 0L), at(math.Pi / 10, 1L), at(math.Pi / 5, 2L))
    val cents = Seq(0L -> Array.tabulate(8)(d => if (d == 0) 1.0f else 0.0f))
    val got = withRocksDb {
      val mem = MemoryStream[EmbDoc]
      val q = StreamSemDedup.cellVerdicts(mem.toDF(), cents, 0.9,
          lateness = "10 seconds", horizonMs = 3600L * 1000L)
        .writeStream.format("memory").queryName("ssdchain").outputMode("append").start()
      mem.addData(rows); q.processAllAvailable()
      q.stop()
      spark.table("ssdchain").select($"doc_id", $"kept")
        .as[(Long, Boolean)].collect().toMap
    }
    assert(got === Map(0L -> true, 1L -> false, 2L -> false),
      s"chain semantics diverged: $got")
    val batchDf = rows.map(r => (r.vec_id, r.embedding)).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val batch = Similarity.semDedupKeep(batchDf, 0.9, cents)
      .select($"vec_id", ($"kept" === 1).as("k"))
      .as[(Long, Boolean)].collect().toMap
    assert(got === batch, s"stream $got vs batch $batch")
  }

  test("verdicts survive a checkpoint restart (the twin arrives after the restart)") {
    withRocksDb {
      val cents = frozenCentroids(0L until 40L)
      val src = java.nio.file.Files.createTempDirectory("ssdsrc").toString
      val ckpt = java.nio.file.Files.createTempDirectory("ssdckpt").toString
      val out = java.nio.file.Files.createTempDirectory("ssdout").toString + "/v"

      def writeBatch(rows: Seq[EmbDoc]): Unit =
        rows.toDS().coalesce(1).write.mode("append").json(src)

      def runOnce(): Unit = {
        val stream = spark.readStream
          .schema(implicitly[org.apache.spark.sql.Encoder[EmbDoc]].schema)
          .json(src)
        val q = StreamSemDedup.cellVerdicts(stream, cents, 0.95,
            lateness = "10 seconds", horizonMs = 3600L * 1000L)
          .writeStream.outputMode("append")
          .foreachBatch { (ds: org.apache.spark.sql.Dataset[StreamSemDedup.SemVerdict],
                           _: Long) =>
            ds.write.mode("append").parquet(out): Unit
          }
          .option("checkpointLocation", ckpt).start()
        q.processAllAvailable(); q.stop()
      }

      writeBatch((0L until 20L).map(doc)); runOnce()
      writeBatch((20L until 40L).map(doc)); runOnce() // restart from ckpt
      val kept = StreamSemDedup.kept(spark.read.parquet(out))
        .select("doc_id").as[Long].collect().toSet
      assert(!kept(30L),
        "restart lost the pre-restart cell state: the twin must still drop")
      assert(kept === (0L until 40L).toSet - 30L)
    }
  }

  test("mega-cell parity: over-maxCell cells sub-split exactly like the batch ladder") {
    implicit val sq = spark.sqlContext
    // ONE cell holding 10 vectors with maxCell = 4: the batch ladder
    // (10 > 4 -> mask 1; 10 > 8 -> mask 3) splits it into 4 hyperplane
    // sub-blocks. Geometry: u is EXACTLY orthogonal to plane 0's first-8
    // slice (u = (q0(1), -q0(0), 0...) — the two double products cancel
    // bit-for-bit), so u ± δ·q0 is a near-pair (cosine ≈ 1) STRADDLING
    // sub-bucket bit 0: batch keeps both; a whole-cell stream would drop
    // the later one. u + 2δ·q0 shares id 0's block and must drop.
    val q0 = Similarity.hyperplanes(64, 8, 7).head.take(8).map(_.toFloat).toArray
    val u = Array(q0(1), -q0(0), 0f, 0f, 0f, 0f, 0f, 0f)
    def plus(s: Float): Array[Float] =
      Array.tabulate(8)(i => u(i) + s * q0(i))
    val vecs: Seq[Array[Float]] =
      Seq(plus(0.01f), plus(0.02f), plus(-0.01f)) ++
        (2 until 8).map(d => Array.tabulate(8)(i => if (i == d) 1.0f else 0.0f)) ++
        Seq(Array.tabulate(8)(i => if (i == 2 || i == 3) 1.0f else 0.0f))
    val cents = Seq(0L -> u)
    val maxCell = 4
    val batchDf = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val masks = Similarity.cellMasks(batchDf, cents, maxCell = maxCell)
    assert(masks === Map(0L -> 3L), s"fixture must trip the ladder: $masks")
    val batch = Similarity.semDedupKeep(batchDf, 0.9, cents, maxCell = maxCell)
      .filter($"kept" === 1).select($"vec_id").as[Long].collect().toSet
    assert(batch(0L) && batch(2L) && !batch(1L),
      s"fixture: the straddling pair must survive batch, the block-mate drop: $batch")
    def run(masksArg: Map[Long, Long], name: String): Set[Long] = withRocksDb {
      val mem = MemoryStream[EmbDoc]
      val q = StreamSemDedup.cellVerdicts(mem.toDF(), cents, 0.9,
          lateness = "10 seconds", horizonMs = 3600L * 1000L,
          cellMasks = masksArg)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      mem.addData(vecs.zipWithIndex.map { case (v, i) =>
        EmbDoc(i.toLong, t(1000L * (i + 1)), v) })
      q.processAllAvailable(); q.stop()
      spark.table(name).filter($"kept").select($"doc_id").as[Long].collect().toSet
    }
    assert(run(masks, "ssdmega") === batch,
      "stream with the batch masks must equal the batch tier on a skewed cell")
    assert(run(Map.empty, "ssdwhole") !== batch,
      "fixture must BITE: the whole-cell stream diverges where the ladder splits")
  }

  test("null-embedding docs pass the gate KEPT with a verdict row (cent_id = -1)") {
    implicit val sq = spark.sqlContext
    val e0 = Array.tabulate(8)(d => if (d == 0) 1.0f else 0.0f)
    val rows = Seq(EmbDoc(0L, t(1000L), e0),
      EmbDoc(1L, t(2000L), null),
      EmbDoc(2L, t(3000L), e0))
    val cents = Seq(0L -> e0)
    val got = withRocksDb {
      val mem = MemoryStream[EmbDoc]
      val q = StreamSemDedup.cellVerdicts(mem.toDF(), cents, 0.95,
          lateness = "10 seconds", horizonMs = 3600L * 1000L)
        .writeStream.format("memory").queryName("ssdnull").outputMode("append").start()
      mem.addData(rows); q.processAllAvailable()
      q.stop()
      spark.table("ssdnull").select($"doc_id", $"cent_id", $"kept")
        .as[(Long, Long, Boolean)].collect().toSet
    }
    assert(got === Set((0L, 0L, true), (1L, -1L, true), (2L, 0L, false)),
      s"null-embedding doc must carry a kept verdict: $got")
    // the batch twin keeps the same set (null cell never joins)
    val batchDf = rows.map(r => (r.vec_id, Option(r.embedding)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val batch = Similarity.semDedupKeep(batchDf, 0.95, cents)
      .filter($"kept" === 1).select($"vec_id").as[Long].collect().toSet
    assert(batch === Set(0L, 1L))
  }

  test("state is bounded by the horizon: expired entries release the cell") {
    implicit val sq = spark.sqlContext
    withRocksDb {
      val cents = Seq(0L -> Array.tabulate(8)(d => if (d == 0) 1.0f else 0.0f))
      val mem = MemoryStream[EmbDoc]
      val q = StreamSemDedup.cellVerdicts(mem.toDF(), cents, 0.95,
          lateness = "0 seconds", horizonMs = 5000L)
        .writeStream.format("memory").queryName("ssdexp").outputMode("append").start()
      def v(id: Long, ms: Long, d0: Float): EmbDoc =
        EmbDoc(id, t(ms), Array.tabulate(8)(d => if (d == 0) d0 else 0.01f))
      mem.addData(Seq(v(1L, 1000L, 1.0f))); q.processAllAvailable()
      // two watermark hops past claim+horizon so the timer fires first
      mem.addData(Seq(v(90L, 100000L, -1.0f))); q.processAllAvailable()
      mem.addData(Seq(v(91L, 200000L, -1.0f))); q.processAllAvailable()
      // same embedding as doc 1, far outside the horizon: kept AGAIN
      mem.addData(Seq(v(99L, 300000L, 1.0f))); q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      q.stop()
      val verdicts = spark.table("ssdexp").select($"doc_id", $"kept")
        .as[(Long, Boolean)].collect().toMap
      assert(verdicts(99L),
        "an expired entry must not suppress a doc a full horizon later")
      // state holds at most the in-horizon vectors (≤ 2 in flight),
      // never the 4 ever seen
      assert(stateRows <= 2L, s"state grew past the horizon bound: $stateRows")
    }
  }
}
