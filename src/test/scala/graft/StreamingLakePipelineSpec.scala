package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.TxLog

object StreamingLakePipelineSpec {
  case class Doc(doc_id: Long, ts: Timestamp, text: String)
  case class CdcDoc(doc_id: Long, ts: Timestamp, text: String, op: String)
}

/** The composed STREAMING lake plan (round-14 directive #1) == the batch
  * [[Pipeline.LakePlan]] on a fixture exercising every tier: quality
  * gate, exact dups, an LSH near-dup trio, a containment pair (contained
  * doc arriving after its superset — the regime where the online policy
  * and the batch policy agree), and a planted semantic twin caught only
  * by the frozen-index gate. The stream runs in two slices over ONE
  * checkpoint lineage with a full restart between them (each planted
  * victim's suppressor arrives BEFORE the restart), and the TxLog
  * hand-off is exactly-once (an idle re-run adds nothing). */
class StreamingLakePipelineSpec extends SparkSpec {
  import spark.implicits._
  import StreamingLakePipelineSpec.Doc

  private def t(ms: Long) = new Timestamp(ms)

  // unique docs share NO tokens (zero shingle overlap -> zero band
  // collisions between unrelated docs, so the claim tier's
  // no-verify contract cannot diverge from the batch jaccard verify)
  private def unique(i: Long): String =
    (0 until 20).map(j => s"u${i}w$j").mkString(" ")
  private def trio(i: Long): String =
    (0 until 24).map(j => s"sv$j").mkString(" ") + s" tail$i"
  private def text(i: Long): String = i match {
    case 12L | 13L => unique(2L)          // exact dups of doc 2
    case 5L => unique(25L) + " xa"        // superset of doc 25 (ca=1.0 on 25's side, j=18/19)
    case x if x >= 20L && x <= 22L => trio(x) // jaccard 21/25=0.84 >= 0.8
    case 29L => "x"                       // single token: fails the 0.05 gate
    case x => unique(x)
  }
  // the LakePipelineSpec embedding fixture: hypercube corners (pairwise
  // cosine <= 0.75) with doc 28 carrying doc 8's exact embedding under a
  // completely different text — only the semantic tier catches it
  private def emb(i: Long): Array[Float] = {
    val src = if (i == 28L) 8L else i
    Array.tabulate(8)(d =>
      if (d >= 6) 1.0f
      else if (((src >> d) & 1L) == 1L) 1.0f else -1.0f)
  }

  test("streaming lake plan == batch LakePlan survivors, restart mid-pipeline, exactly-once sink") {
    val base = java.nio.file.Files.createTempDirectory("graft_slake").toString
    val srcZone = s"$base/src"
    val embZone = s"$base/emb"
    val ids = 0L until 30L

    TxLog.replace(spark, srcZone,
      ids.map(i => (i, text(i))).toDF("doc_id", "text"))
    TxLog.replace(spark, embZone,
      ids.map(i => (i, emb(i))).toDF("doc_id", "embedding")
        .select($"doc_id", $"embedding".cast("array<float>").as("embedding")))

    // 1) the BATCH plan: staged zones + the ANN index artifact the
    //    stream will gate against (the stream never trains)
    val batchSpec = Pipeline.LakeSpec(srcZone = srcZone, lakeDir = s"$base/lake",
      minQuality = 0.05, containment = 0.95, nearDupJaccard = 0.8,
      splits = Seq("train" -> 0.8, "valid" -> 0.2), packCapacity = 64L,
      semantic = Some(Pipeline.SemanticSpec(embZone, threshold = 0.95)))
    val batchPlan = Pipeline.plan(spark, batchSpec)
    batchPlan.run()
    val batchIds = TxLog.read(spark, batchPlan.semDedupedZone)
      .select($"doc_id").as[Long].collect().toSet
    // fixture sanity: every tier fired exactly as planted
    assert(batchIds.size === 23, s"batch survivors: $batchIds")
    assert(Set(29L, 12L, 13L, 25L, 21L, 22L, 28L).forall(!batchIds(_)),
      s"gate/exact/containment/LSH/semantic drops expected: $batchIds")
    assert(batchIds(2L) && batchIds(5L) && batchIds(20L) && batchIds(8L))

    // 2) the STREAMING plan over the same docs, two slices through one
    //    checkpoint lineage with a full restart between them — the
    //    suppressors (2, 5, 8) land in slice 1, their victims (12/13 in
    //    slice 1; 20's trio-mates, 25, 28) in slice 2, so cross-restart
    //    claim state and cell state both carry the verdicts
    val srcDir = s"$base/docs"
    val streamSpec = Pipeline.StreamingLakeSpec(
      lakeDir = s"$base/streamlake", checkpointDir = s"$base/ckpt",
      minQuality = 0.05, lateness = "10 seconds",
      horizonMs = 3600L * 1000L,
      splits = Seq("train" -> 0.8, "valid" -> 0.2),
      semantic = Some(Pipeline.StreamingSemanticSpec(
        embZone = Some(embZone), threshold = 0.95,
        indexDir = Some(batchPlan.annIndexDir))))
    val streamPlan = Pipeline.plan(spark, streamSpec)

    def writeSlice(slice: Seq[Long]): Unit =
      slice.map(i => Doc(i, t(1000L * (i + 1)), text(i)))
        .toDS().coalesce(1).write.mode("append").json(srcDir)
    def docsStream() = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
      .json(srcDir)

    writeSlice(0L until 15L)
    streamPlan.runOnce(docsStream())
    writeSlice(15L until 30L)
    streamPlan.runOnce(docsStream()) // restart from the checkpoints

    val streamIds = TxLog.read(spark, streamPlan.corpusZone)
      .select($"doc_id").as[Long].collect().toSet
    assert(streamIds === batchIds,
      s"stream $streamIds vs batch $batchIds")

    // textual hop zone too: the batch textual survivors (pre-semantic)
    val batchTextual = TxLog.read(spark, batchPlan.dedupedZone)
      .select($"doc_id").as[Long].collect().toSet
    val streamTextual = TxLog.read(spark, streamPlan.dedupedZone)
      .select($"doc_id").as[Long].collect().toSet
    assert(streamTextual === batchTextual,
      s"textual hop: stream $streamTextual vs batch $batchTextual")

    // 3) exactly-once: an idle re-run (no new input) adds nothing —
    //    replayed batch ids are skipped by the manifest high-water mark
    val rowsBefore = TxLog.read(spark, streamPlan.corpusZone).count()
    streamPlan.runOnce(docsStream())
    assert(TxLog.read(spark, streamPlan.corpusZone).count() === rowsBefore,
      "an idle re-run must not duplicate corpus rows")
    assert(TxLog.read(spark, streamPlan.corpusZone)
      .groupBy($"doc_id").count().filter($"count" > 1).count() === 0L,
      "no doc may land twice across restarts")

    // 4) the corpus read model: deterministic split assignment equals
    //    the batch assignment on the shared survivor set
    val streamSplits = streamPlan.corpus()
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val batchSplits = graft.operators.Splits.assignSplit(
        TxLog.read(spark, batchPlan.semDedupedZone), "doc_id", streamSpec.splits)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(streamSplits === batchSplits)
  }

  test("continuous mode: start() runs both hops live, hop 2 tails hop 1's zone mid-stream") {
    val base = java.nio.file.Files.createTempDirectory("graft_slake_cont").toString
    val embZone = s"$base/emb"
    val ids = 0L until 12L
    def contEmb(i: Long): Array[Float] = {
      val src = if (i == 11L) 1L else i // planted twin: 11 carries 1's embedding
      Array.tabulate(8)(d =>
        if (d >= 6) 1.0f
        else if (((src >> d) & 1L) == 1L) 1.0f else -1.0f)
    }
    TxLog.replace(spark, embZone,
      ids.map(i => (i, contEmb(i))).toDF("doc_id", "embedding")
        .select($"doc_id", $"embedding".cast("array<float>").as("embedding")))
    val idxDir = s"$base/idx"
    graft.operators.AnnIndex.build(spark, idxDir, embZone, idCol = "doc_id")

    val srcDir = s"$base/docs"
    def writeSlice(slice: Seq[Long]): Unit =
      slice.map(i => Doc(i, t(1000L * (i + 1)), unique(i)))
        .toDS().coalesce(1).write.mode("append").json(srcDir)
    writeSlice(0L until 6L)

    val spec = Pipeline.StreamingLakeSpec(
      lakeDir = s"$base/lake", checkpointDir = s"$base/ckpt",
      triggerSeconds = 1L,
      semantic = Some(Pipeline.StreamingSemanticSpec(
        embZone = Some(embZone), threshold = 0.95, indexDir = Some(idxDir))))
    val plan = Pipeline.plan(spark, spec)
    val qs = plan.start(spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
      .json(srcDir))
    try {
      qs.foreach(_.processAllAvailable())
      assert(TxLog.read(spark, plan.corpusZone)
        .select($"doc_id").as[Long].collect().toSet === (0L until 6L).toSet)
      // new docs flow through BOTH live hops; the twin (11, carrying
      // doc 1's embedding from the first slice) drops at the live
      // semantic gate — cross-slice cell state on a running query
      writeSlice(6L until 12L)
      qs.foreach(_.processAllAvailable())
      val got = TxLog.read(spark, plan.corpusZone)
        .select($"doc_id").as[Long].collect().toSet
      assert(got === (0L until 11L).toSet,
        s"the live twin must drop, everything else land: $got")
    } finally qs.foreach(_.stop())
  }

  test("the reference stack, continuously: shard CDC envelopes stream through the composed lake plan") {
    // The north star's literal sentence as ONE streaming artifact: the
    // Kinesis-shaped shard transport's CDC envelopes (the reference's
    // firehose input) parse, flatten, and flow through gate -> textual
    // dedup -> semantic dedup -> the TxLog corpus zone, continuously,
    // with a restart between two envelope waves. Insert-shaped feed:
    // keyed UPSERTS belong to TxLog.cdcMergeSink + the batch plan's
    // watermark resume (LakePipelineSpec); the streaming plan gates an
    // append-shaped doc feed.
    import graft.sources.{ShardCdcSource, ShardStore}
    val base = java.nio.file.Files.createTempDirectory("graft_slake_cdc").toString
    val shardDir = s"$base/shards"
    val embZone = s"$base/emb"
    def envelope(id: Long, payload: String): String =
      s"""{"eventName":"INSERT","dynamodb":{"ApproximateCreationDateTime":${1687310000 + id}.0,""" +
        s""""Keys":{"id":{"N":"$id"}},""" +
        s""""NewImage":{"id":{"N":"$id"},"payload":{"S":"$payload"},"seq":{"N":"$id"}}}}"""
    def cdcText(i: Long): String = i match {
      case 15L | 16L => unique(3L) // exact dups of doc 3
      case x => unique(x)
    }
    def cdcEmb(i: Long): Array[Float] = {
      val src = if (i == 18L) 4L else i // planted semantic twin of doc 4
      Array.tabulate(8)(d =>
        if (d >= 6) 1.0f
        else if (((src >> d) & 1L) == 1L) 1.0f else -1.0f)
    }
    TxLog.replace(spark, embZone,
      (0L until 20L).map(i => (i, cdcEmb(i))).toDF("doc_id", "embedding")
        .select($"doc_id", $"embedding".cast("array<float>").as("embedding")))
    val idxDir = s"$base/idx"
    graft.operators.AnnIndex.build(spark, idxDir, embZone, idCol = "doc_id")

    val st = new ShardStore(shardDir)
    st.createStream(4)
    val spec = Pipeline.StreamingLakeSpec(
      lakeDir = s"$base/lake", checkpointDir = s"$base/ckpt",
      semantic = Some(Pipeline.StreamingSemanticSpec(
        embZone = Some(embZone), threshold = 0.95, indexDir = Some(idxDir))))
    val plan = Pipeline.plan(spark, spec)

    def docStream(): org.apache.spark.sql.DataFrame = {
      val parsed = ShardCdcSource(shardDir).stream(spark)
      val img = col("dynamodb.NewImage")
      parsed
        .filter(col("_corrupt_record").isNull &&
          col("eventName").isin("INSERT", "MODIFY"))
        .select(
          element_at(element_at(img, "id"), "N").cast("long").as("doc_id"),
          timestamp_seconds(col("dynamodb.ApproximateCreationDateTime")).as("ts"),
          element_at(element_at(img, "payload"), "S").as("text"))
    }

    for (i <- 0L until 12L) st.put(i.toString, envelope(i, cdcText(i)))
    plan.runOnce(docStream())
    // second envelope wave AFTER a full plan restart: the exact dups'
    // canonical (3) and the twin's original (4) landed pre-restart
    for (i <- 12L until 20L) st.put(i.toString, envelope(i, cdcText(i)))
    plan.runOnce(docStream())

    val got = TxLog.read(spark, plan.corpusZone)
      .select($"doc_id").as[Long].collect().toSet
    assert(got === (0L until 20L).toSet -- Set(15L, 16L, 18L),
      s"exact dups and the semantic twin must drop across the restart: $got")
  }

  test("first-ever runOnce with a semantic tier drains an empty source as a clean no-op") {
    // round-15 ADVICE (low): runOnce used to skip the deduped-zone
    // priming start() does, so a first-ever drain over an empty source
    // left hop 1 committing nothing and hop 2's txlog load() throwing
    // "has no transaction log yet"
    val base = java.nio.file.Files.createTempDirectory("graft_slake_noop").toString
    val embZone = s"$base/emb"
    val ids = 0L until 4L
    TxLog.replace(spark, embZone,
      ids.map(i => (i, emb(i))).toDF("doc_id", "embedding")
        .select($"doc_id", $"embedding".cast("array<float>").as("embedding")))
    val idxDir = s"$base/idx"
    graft.operators.AnnIndex.build(spark, idxDir, embZone, idCol = "doc_id")
    val srcDir = s"$base/docs"
    new java.io.File(srcDir).mkdirs()
    val plan = Pipeline.plan(spark, Pipeline.StreamingLakeSpec(
      lakeDir = s"$base/lake", checkpointDir = s"$base/ckpt",
      semantic = Some(Pipeline.StreamingSemanticSpec(
        embZone = Some(embZone), threshold = 0.95, indexDir = Some(idxDir)))))
    def docsStream() = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
      .json(srcDir)
    plan.runOnce(docsStream()) // must not throw
    // and the primed lineage keeps working: real docs land on the next drain
    ids.map(i => Doc(i, t(1000L * (i + 1)), unique(i)))
      .toDS().coalesce(1).write.mode("append").json(srcDir)
    plan.runOnce(docsStream())
    assert(TxLog.read(spark, plan.corpusZone)
      .select($"doc_id").as[Long].collect().toSet === ids.toSet)
  }

  test("sub-split masks derive from SURVIVOR occupancy: stream == batch on a rung-straddling mega-cell") {
    // round-15 directive #5: the stream's masks used to come from the
    // INDEX's committed occupancy; on a mega-cell whose textual-survivor
    // count sits on a lower ladder rung than its indexed count, those
    // masks split survivors the batch tier compares whole-cell — the
    // planted twins below straddle the index ladder's blocks, so the old
    // source provably diverges and the survivor source must not.
    import graft.operators.{AnnIndex, Similarity}
    val base = java.nio.file.Files.createTempDirectory("graft_slake_mask").toString
    val embZone = s"$base/emb"

    // find a perturbed copy of vBase with rounded cosine >= 0.95 whose
    // dim-64/8-bit hyperplane bucket DIFFERS in the low 2 bits (the
    // indexed ladder's mask) — one pass over a candidate frame
    val vBase = Array.tabulate(8)(d =>
      if (d < 2) 1.0f else if (d % 2 == 0) 0.6f else -0.6f)
    val cands = (0 until 320).map { i =>
      val v = vBase.clone()
      val d = i % 8
      v(d) = v(d) + ((i / 8) - 20) * 0.02f
      (i.toLong, v)
    }
    val scored = cands.toDF("cand", "v")
      .select($"cand", $"v".cast("array<float>").as("v"))
      .select($"cand",
        Similarity.hyperplaneBucket($"v", dim = 64, nBits = 8).as("bkt"),
        round(graft.functions.VectorFunctions.cosine(
          $"v", typedLit(vBase).cast("array<float>")), 4).as("cos"))
      .as[(Long, Long, Double)].collect()
    val baseBkt = {
      val df = Seq((0L, vBase)).toDF("cand", "v")
        .select(Similarity.hyperplaneBucket(
          $"v".cast("array<float>"), dim = 64, nBits = 8))
      df.as[Long].collect().head
    }
    val twinId = scored.find { case (_, b, c) =>
      c >= 0.95 && (b & 3L) != (baseBkt & 3L) && (b & 1L) == (baseBkt & 1L)
    }.orElse(scored.find { case (_, b, c) =>
      c >= 0.95 && (b & 3L) != (baseBkt & 3L)
    }).map(_._1).getOrElse(sys.error("fixture: no straddling twin found"))
    val vTwin = cands(twinId.toInt)._2

    // ids 0..11 all land in ONE cell (k=1): 0/1 far corners, 2=vBase,
    // 3=its straddling twin, 4..11 padding; texts make 4..11 exact dups
    // of doc 0, so the textual tier keeps exactly {0,1,2,3}
    def fixEmb(i: Long): Array[Float] = i match {
      case 0L => Array.tabulate(8)(d => if (d % 2 == 0) 1.0f else -1.0f)
      case 1L => Array.tabulate(8)(d => if (d % 2 == 0) -1.0f else 1.0f)
      case 2L => vBase
      case 3L => vTwin
      case x => Array.tabulate(8)(d =>
        (if (d % 2 == 0) 1.0f else -1.0f) * (1.0f + 0.01f * x))
    }
    val ids = 0L until 12L
    TxLog.replace(spark, embZone,
      ids.map(i => (i, fixEmb(i))).toDF("doc_id", "embedding")
        .select($"doc_id", $"embedding".cast("array<float>").as("embedding")))
    val srcZone = s"$base/src"
    def maskText(i: Long): String = if (i >= 4L) unique(0L) else unique(i)
    TxLog.replace(spark, srcZone,
      ids.map(i => (i, maskText(i))).toDF("doc_id", "text"))

    // mega-cell index: every vector in one cell of 12; indexed ladder at
    // maxCell=4 -> mask 3; survivor ladder over {0,1,2,3} -> no split
    val batchLakeDir = s"$base/lake"
    AnnIndex.build(spark, batchLakeDir + "/annindex", embZone,
      k = Some(1), idCol = "doc_id")
    assert(AnnIndex.cellMasks(spark, batchLakeDir + "/annindex", maxCell = 4)
      .values.toSeq === Seq(3L), "fixture: indexed occupancy must ladder to mask 3")

    val batchPlan = Pipeline.plan(spark, Pipeline.LakeSpec(
      srcZone = srcZone, lakeDir = batchLakeDir,
      minQuality = 0.0, containment = 0.95, nearDupJaccard = 0.8,
      semantic = Some(Pipeline.SemanticSpec(embZone, threshold = 0.95, maxCell = 4))))
    batchPlan.run()
    val batchIds = TxLog.read(spark, batchPlan.semDedupedZone)
      .select($"doc_id").as[Long].collect().toSet
    assert(batchIds === Set(0L, 1L, 2L),
      s"batch must whole-cell-compare the 4 survivors and drop the twin: $batchIds")

    val srcDir = s"$base/docs"
    ids.map(i => Doc(i, t(1000L * (i + 1)), maskText(i)))
      .toDS().coalesce(1).write.mode("append").json(srcDir)
    val streamPlan = Pipeline.plan(spark, Pipeline.StreamingLakeSpec(
      lakeDir = s"$base/streamlake", checkpointDir = s"$base/ckpt",
      semantic = Some(Pipeline.StreamingSemanticSpec(
        embZone = Some(embZone), threshold = 0.95,
        indexDir = Some(batchPlan.annIndexDir), maxCell = 4))))
    streamPlan.runOnce(spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
      .json(srcDir))
    val streamIds = TxLog.read(spark, streamPlan.corpusZone)
      .select($"doc_id").as[Long].collect().toSet
    assert(streamIds === batchIds,
      s"survivor-derived masks must keep stream == batch: $streamIds vs $batchIds " +
        "(index-derived masks would block 2 and 3 apart and keep the twin)")
  }

  test("keyed-CDC mode: MODIFY replaces, REMOVE retracts, dup/gate-fail updates retract — corpus == batch snapshot->LakePlan across a restart") {
    // round-15 directive #4: the one composition seam left — keyed
    // upsert feeds used to route to cdcMergeSink + the batch plan by doc
    // note. Here the README three-put sequence (one key, three images)
    // plus a MODIFY/REMOVE wave drive StreamingLakePlan(opCol) through a
    // full restart, and the final keyed corpus equals the batch plan run
    // over the feed's LWW snapshot.
    import StreamingLakePipelineSpec.CdcDoc
    val base = java.nio.file.Files.createTempDirectory("graft_slake_keyed").toString
    val embZone = s"$base/emb"
    val refKey = 864732L
    // embeddings keyed by doc id; 10 is a planted semantic twin of 2
    def kEmb(i: Long): Array[Float] = {
      val src = if (i == 10L) 2L else (i % 32L)
      Array.tabulate(8)(d =>
        if (d >= 6) 1.0f
        else if (((src >> d) & 1L) == 1L) 1.0f else -1.0f)
    }
    val embIds = (1L to 11L) :+ refKey
    TxLog.replace(spark, embZone,
      embIds.map(i => (i, kEmb(i))).toDF("doc_id", "embedding")
        .select($"doc_id", $"embedding".cast("array<float>").as("embedding")))
    // build the frozen quantizer where the batch plan expects it, so
    // both plans gate against one index (the main equivalence spec's
    // sharing contract, with the stream running FIRST this time)
    val batchLakeDir = s"$base/lake"
    val idxDir = s"$batchLakeDir/annindex"
    graft.operators.AnnIndex.build(spark, idxDir, embZone, idCol = "doc_id")

    // wave 1: the three-put sequence on the reference key + inserts
    val wave1 = Seq(
      CdcDoc(refKey, t(1000L), unique(50L), "INSERT"),
      CdcDoc(refKey, t(2000L), unique(51L), "MODIFY"),
      CdcDoc(refKey, t(3000L), unique(52L), "MODIFY")) ++
      (1L to 9L).map(i => CdcDoc(i, t(10000L + 1000L * i), unique(i), "INSERT"))
    // wave 2 (post-restart): every retraction class + a replace + a new
    // insert + the planted semantic twin
    val wave2 = Seq(
      CdcDoc(8L, t(30000L), unique(1L), "MODIFY"), // now dups key 1 -> retract
      CdcDoc(9L, t(31000L), "x", "MODIFY"),        // fails the gate -> retract
      CdcDoc(7L, t(32000L), unique(7L), "REMOVE"), // tombstone
      CdcDoc(5L, t(33000L), unique(55L), "MODIFY"),// fresh text -> replace
      CdcDoc(10L, t(34000L), unique(10L), "INSERT"), // semantic twin of 2 -> never lands
      CdcDoc(11L, t(35000L), unique(11L), "INSERT"))

    val srcDir = s"$base/envelopes"
    def write(docs: Seq[CdcDoc]): Unit =
      docs.toDS().coalesce(1).write.mode("append").json(srcDir)
    def stream() = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[CdcDoc]].schema)
      .json(srcDir)

    val plan = Pipeline.plan(spark, Pipeline.StreamingLakeSpec(
      lakeDir = s"$base/streamlake", checkpointDir = s"$base/ckpt",
      minQuality = 0.05, horizonMs = 3600L * 1000L, opCol = Some("op"),
      semantic = Some(Pipeline.StreamingSemanticSpec(
        embZone = Some(embZone), threshold = 0.95, indexDir = Some(idxDir)))))
    write(wave1)
    plan.runOnce(stream())
    write(wave2)
    plan.runOnce(stream()) // full restart from the checkpoints

    // batch reference: the feed's LWW snapshot (REMOVE retracts) through
    // the batch LakePlan over the same index
    val all = wave1 ++ wave2
    val snapshot = all.groupBy(_.doc_id).toSeq
      .map { case (_, evs) => evs.maxBy(_.ts.getTime) }
      .filter(_.op != "REMOVE")
      .map(d => (d.doc_id, d.text))
    val srcZone = s"$base/src"
    TxLog.replace(spark, srcZone, snapshot.toDF("doc_id", "text"))
    val batchPlan = Pipeline.plan(spark, Pipeline.LakeSpec(
      srcZone = srcZone, lakeDir = batchLakeDir,
      minQuality = 0.05, containment = 0.95, nearDupJaccard = 0.8,
      semantic = Some(Pipeline.SemanticSpec(embZone, threshold = 0.95))))
    batchPlan.run()
    val batchRows = TxLog.read(spark, batchPlan.semDedupedZone)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSet

    val streamRows = TxLog.read(spark, plan.corpusZone)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSet
    assert(streamRows === batchRows,
      s"keyed stream corpus must equal batch snapshot->LakePlan:\n$streamRows\nvs\n$batchRows")
    // the classes, explicitly: replaced text, retractions, the twin
    val byId = streamRows.toMap
    assert(byId(refKey) === unique(52L), "the three-put key must hold put 3's image")
    assert(byId(5L) === unique(55L), "a MODIFY with fresh text must replace")
    assert(!byId.contains(7L) && !byId.contains(8L) && !byId.contains(9L) &&
      !byId.contains(10L), "REMOVE/dup/gate-fail/semantic-twin must all retract")
    assert(byId.contains(11L) && byId.contains(1L) && byId.contains(2L))
    // keyed zone: exactly one row per key, and an idle re-run adds nothing
    assert(TxLog.read(spark, plan.corpusZone).groupBy($"doc_id").count()
      .filter($"count" > 1).count() === 0L)
    plan.runOnce(stream())
    assert(TxLog.read(spark, plan.corpusZone)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSet === streamRows,
      "an idle keyed re-run must not change the corpus")
  }

  test("keyed-CDC textual-only plan: changes apply straight to the keyed corpus zone") {
    import StreamingLakePipelineSpec.CdcDoc
    val base = java.nio.file.Files.createTempDirectory("graft_slake_keyed_txt").toString
    val srcDir = s"$base/envelopes"
    val plan = Pipeline.plan(spark, Pipeline.StreamingLakeSpec(
      lakeDir = s"$base/lake", checkpointDir = s"$base/ckpt",
      opCol = Some("op")))
    assert(plan.corpusZone !== plan.dedupedZone,
      "keyed mode needs a keyed corpus zone distinct from the changelog")
    Seq(
      CdcDoc(1L, t(1000L), unique(1L), "INSERT"),
      CdcDoc(2L, t(2000L), unique(2L), "INSERT"),
      CdcDoc(3L, t(3000L), unique(2L), "INSERT"), // exact dup of 2 -> never lands
      CdcDoc(1L, t(4000L), unique(12L), "MODIFY"),
      CdcDoc(2L, t(5000L), unique(2L), "REMOVE"))
      .toDS().coalesce(1).write.mode("append").json(srcDir)
    plan.runOnce(spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[CdcDoc]].schema)
      .json(srcDir))
    val got = TxLog.read(spark, plan.corpusZone)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSet
    assert(got === Set((1L, unique(12L))),
      s"1 replaced, 2 removed, 3 suppressed as dup: $got")
  }

  test("streaming containment tier: subset of an EARLIER doc drops (== batch); contained-arrived-first is the pinned irreducible class") {
    // round-16 (the round-15 directive-#1 attribution): the composed
    // stream's entire sf3 under-drop measured CONTAINMENT-class — subset
    // pairs have low jaccard, so no band tier sees them. The shingle-
    // claim tier closes the pairs whose container arrived first (886 of
    // 3,036 at sf3); the other direction needs retraction — batch drops
    // the contained side regardless of order — and is pinned here as the
    // irreducible online class.
    val base = java.nio.file.Files.createTempDirectory("graft_slake_cont").toString
    def sup(i: Long): String =
      unique(i) + " " + (0 until 20).map(j => s"x${i}e$j").mkString(" ")
    // 1 ⊃ 2 with the superset EARLIER (catchable: 2 drops both sides);
    // 3 ⊂ 4 with the contained doc EARLIER (irreducible: batch drops 3,
    // the stream cannot). Shingle jaccard of each pair ≈ 0.47 — far
    // below the 0.8 band threshold, so containment is the only tier
    // that can fire.
    def txt(i: Long): String = i match {
      case 1L => sup(30L)
      case 2L => unique(30L)
      case 3L => unique(31L)
      case 4L => sup(31L)
      case x => unique(x)
    }
    val ids = 0L until 6L
    val srcZone = s"$base/src"
    TxLog.replace(spark, srcZone, ids.map(i => (i, txt(i))).toDF("doc_id", "text"))
    val batchPlan = Pipeline.plan(spark, Pipeline.LakeSpec(
      srcZone = srcZone, lakeDir = s"$base/lake",
      minQuality = 0.0, containment = 0.95, nearDupJaccard = 0.8))
    batchPlan.run()
    val batchIds = TxLog.read(spark, batchPlan.dedupedZone)
      .select($"doc_id").as[Long].collect().toSet
    assert(batchIds === ids.toSet -- Set(2L, 3L),
      s"batch drops the contained side of both pairs: $batchIds")

    val srcDir = s"$base/docs"
    def writeSlice(slice: Seq[Long]): Unit =
      slice.map(i => Doc(i, t(1000L * (i + 1)), txt(i)))
        .toDS().coalesce(1).write.mode("append").json(srcDir)
    def stream() = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
      .json(srcDir)
    val plan = Pipeline.plan(spark, Pipeline.StreamingLakeSpec(
      lakeDir = s"$base/streamlake", checkpointDir = s"$base/ckpt",
      containment = Some(0.95), horizonMs = 3600L * 1000L))
    // superset 1 lands BEFORE the restart; its subset 2 arrives after —
    // the suppression crosses the checkpoint through shingle-claim state
    writeSlice(Seq(0L, 1L, 3L))
    plan.runOnce(stream())
    writeSlice(Seq(2L, 4L, 5L))
    plan.runOnce(stream())
    val streamIds = TxLog.read(spark, plan.corpusZone)
      .select($"doc_id").as[Long].collect().toSet
    assert(streamIds === ids.toSet - 2L,
      s"the stream drops 2 (container seen first) and keeps 3: $streamIds")
    assert((streamIds -- batchIds) === Set(3L),
      "the irreducible class is exactly the contained-arrived-first doc")
  }

  test("textual-only plan (no semantic tier): the deduped zone IS the corpus zone") {
    val base = java.nio.file.Files.createTempDirectory("graft_slake_txt").toString
    val srcDir = s"$base/docs"
    (0L until 8L).map(i => Doc(i, t(1000L * (i + 1)),
        if (i == 6L) unique(1L) else unique(i)))
      .toDS().coalesce(1).write.mode("append").json(srcDir)
    val plan = Pipeline.plan(spark, Pipeline.StreamingLakeSpec(
      lakeDir = s"$base/lake", checkpointDir = s"$base/ckpt",
      splits = Seq("train" -> 0.9, "valid" -> 0.1)))
    assert(plan.corpusZone === plan.dedupedZone)
    plan.runOnce(spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[Doc]].schema)
      .json(srcDir))
    val corpus = plan.corpus()
    assert(corpus.select($"doc_id").as[Long].collect().toSet ===
      (0L until 8L).toSet - 6L, "the exact dup drops, no semantic hop runs")
    assert(corpus.columns.contains("split") &&
      corpus.filter($"split".isNull).count() === 0L)
  }
}
