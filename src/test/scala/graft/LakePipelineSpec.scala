package graft

import org.apache.spark.sql.functions._
import graft.operators.{FullLoad, TxLog}
import graft.sources.{DynamoFake, ShardCdcSource, ShardStore}

/** The round-12 durable E2E artifact: the WHOLE reference stack
  * (fake-DDB segmented full load → Kinesis-shaped shard CDC → exactly-
  * once merge sink, ReferenceStackSpec's loop) extended with the LLM
  * tier — quality gate → three-tier dedup (exact + adaptive pair-stats
  * containment + LSH clusters) → md5 splits → sequence packing — as ONE
  * `Pipeline.LakePlan` run over staged TxLog zones. Every intermediate
  * is a time-travelable table; re-running the plan is a watermark
  * resume (unchanged upstream ⇒ stage skipped, generation unchanged);
  * new CDC merges flow through to refreshed training zones. */
class LakePipelineSpec extends SparkSpec {
  import spark.implicits._

  private def envelope(event: String, id: Long, payload: String, seq: Long): String =
    s"""{"eventName":"$event","dynamodb":{"ApproximateCreationDateTime":${1687310000 + seq}.0,""" +
      s""""Keys":{"id":{"N":"$id"}},""" +
      s""""NewImage":{"id":{"N":"$id"},"payload":{"S":"$payload"},"seq":{"N":"$seq"}}}}"""

  // deterministic corpus content (see expectations below)
  private def unique(id: Long): String =
    "alpha beta gamma " + (0 until 17).map(j => s"u${id}x$j").mkString(" ")
  private def text(id: Long): String = id match {
    case i if i >= 150 && i < 160 => unique(5)                // exact dups of doc 5
    case i if i >= 170 && i < 173 =>                          // LSH near-dup trio
      "alpha beta gamma " + (0 until 16).map(j => s"sharedv$j").mkString(" ") + s" tail$i"
    case 180 =>                                               // doc 0 + boilerplate wrap
      unique(0) + " " + (0 until 15).map(j => s"extra$j").mkString(" ")
    case i => unique(i)
  }

  test("fake-DDB -> shard CDC -> merge -> gated/deduped/split/packed zones, resumable and time-travelable") {
    val base = java.nio.file.Files.createTempDirectory("graft_lake").toString
    val loadDest = s"$base/full_load"
    val stateZone = s"$base/state"
    val shardDir = s"$base/shards"
    val ckpt = s"$base/ckpt"
    val lakeDir = s"$base/lake"

    // 1) reference stack: full load lands 300 single-token rows
    val table = DynamoFake.FakeDynamoTable(totalRows = 300L, pageItems = 64)
    FullLoad.runScan(spark,
      DynamoFake.ThrottledDynamoScan(table, provisionedRcu = 1e9),
      splits = 4, destPath = loadDest, outputPartitions = 2)
    TxLog.replace(spark, stateZone,
      FullLoad.readBack(spark, loadDest)
        .select(col("id"), col("payload"), lit(0L).as("seq")),
      statsCols = Seq("id"))

    // 2) CDC: ids 0..199 get real 20+-token texts through the shard
    //    transport, with planted exact/near/contained duplicates
    val st = new ShardStore(shardDir)
    st.createStream(4)
    for (id <- 0L until 200L) st.put(id.toString, envelope("MODIFY", id, text(id), 1L))
    def mergeOnce(): Unit = {
      val parsed = ShardCdcSource(shardDir).stream(spark)
      val img = col("dynamodb.NewImage")
      val flat = parsed
        .filter(col("_corrupt_record").isNull && col("eventName").isin("INSERT", "MODIFY"))
        .select(element_at(element_at(img, "id"), "N").cast("long").as("id"),
          element_at(element_at(img, "payload"), "S").as("payload"),
          element_at(element_at(img, "seq"), "N").cast("long").as("seq"))
      val q = flat.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(TxLog.cdcMergeSink(stateZone, "id", "seq"))
        .outputMode("update").start()
      q.processAllAvailable(); q.stop()
    }
    mergeOnce()
    assert(TxLog.read(spark, stateZone).count() === 300L)

    // 3) the LLM tier as one staged plan over TxLog zones
    val spec = Pipeline.LakeSpec(srcZone = stateZone, lakeDir = lakeDir,
      idCol = "id", textCol = "payload", minQuality = 0.05,
      containment = 0.95, nearDupJaccard = 0.8,
      splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1),
      packCapacity = 128L)
    val plan = Pipeline.plan(spark, spec)
    plan.run()

    // gate: the 100 un-texted base rows (quality 0.01) fall; 200 survive
    assert(TxLog.read(spark, plan.gatedZone).count() === 200L)

    // dedup expectations, hand-derived from the planted content:
    //  - exact: 150..159 copy doc 5 -> canonical 5 survives, 10 drop
    //  - containment(0.95): doc 0 is FULLY contained in doc 180 (its
    //    wrap), ca = 1.0 -> doc 0 drops, 180 survives; the LSH trio's
    //    mutual containment is 17/18 = 0.944 < 0.95 -> passes this tier
    //  - LSH jaccard(0.8): trio 170..172 pairwise j = 17/19 = 0.895 ->
    //    one cluster, lowest id 170 survives, 171/172 drop
    val deduped = TxLog.read(spark, plan.dedupedZone)
    val ids = deduped.select($"id").as[Long].collect().toSet
    assert(deduped.count() === 187L, s"expected 200 - 10 - 1 - 2 survivors")
    assert(!ids.exists(i => i >= 150 && i < 160), "exact dups must drop")
    assert(ids(5L), "the exact group's canonical (lowest id) survives")
    assert(!ids(0L) && ids(180L), "the contained doc drops, its wrap survives")
    assert(ids(170L) && !ids(171L) && !ids(172L), "LSH cluster keeps the minimum")

    // splits: three zones, disjoint, union = survivors, assignment = md5
    val splitIds = spec.splits.map { case (name, _) =>
      name -> TxLog.read(spark, plan.splitZone(name)).select($"id").as[Long].collect().toSet
    }.toMap
    assert(splitIds.values.map(_.size).sum === 187)
    assert(splitIds.values.reduce(_ ++ _) === ids)
    val expected = graft.operators.Splits.assignSplit(deduped, "id", spec.splits)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    splitIds.foreach { case (name, s) =>
      assert(s.forall(expected(_) == name), s"split $name carries foreign ids")
    }

    // packing: one row per survivor; per-split bins are the greedy
    // sequential floor(cum/capacity) plan — token sums conserved, every
    // bin below capacity + one doc, bins contiguous from 0
    val packed = plan.packed()
      .select($"split", $"bin", $"doc_id", $"n_tok")
      .as[(String, Long, Long, Long)].collect()
    assert(packed.length === 187)
    assert(packed.map(_._4).sum ===
      deduped.select(size(split($"payload", " ")).cast("long")).as[Long].collect().sum)
    packed.groupBy(_._1).foreach { case (name, rows) =>
      val byBin = rows.groupBy(_._2).view.mapValues(_.map(_._4).sum)
      val maxDoc = rows.map(_._4).max
      assert(byBin.values.forall(_ <= 128L + maxDoc),
        s"split $name has an over-packed bin: ${byBin.toMap}")
      assert(byBin.keySet === (0L until byBin.keySet.size).toSet,
        s"split $name bins must be contiguous from 0")
    }

    // 4) RESUME: an idle re-run advances NOTHING (watermark skip)
    val gens0 = Seq(plan.gatedZone, plan.dedupedZone, plan.packedZone) ++
      spec.splits.map(s => plan.splitZone(s._1))
    val before = gens0.map(z => z -> TxLog.latest(spark, z).get.gen).toMap
    plan.run()
    gens0.foreach { z =>
      assert(TxLog.latest(spark, z).get.gen === before(z),
        s"idle re-run must not advance $z")
    }

    // 5) new CDC flows through: doc 1 gets fresh text; the stream
    //    checkpoint resumes, the plan refreshes the stale suffix, and
    //    the pre-refresh corpus stays readable by generation
    val dedupedGen0 = TxLog.latest(spark, plan.dedupedZone).get.gen
    st.put("1", envelope("MODIFY", 1L, unique(1) + " refreshed extra tokens", 2L))
    mergeOnce()
    plan.run()
    assert(TxLog.latest(spark, plan.dedupedZone).get.gen > dedupedGen0,
      "new upstream data must advance the dedup stage")
    val now = TxLog.read(spark, plan.dedupedZone)
      .filter($"id" === 1L).select($"payload").as[String].head()
    assert(now.endsWith("refreshed extra tokens"))
    val was = TxLog.readSnapshot(spark, plan.dedupedZone,
      TxLog.snapshotAt(spark, plan.dedupedZone, dedupedGen0).get)
      .filter($"id" === 1L).select($"payload").as[String].head()
    assert(was === unique(1L), "time travel must keep the pre-refresh corpus")

    // 6) a changed knob forces recompute — the config fingerprint in the
    //    stage watermark refuses to skip-serve results computed under the
    //    old spec (the upstream generation alone has not moved)
    val dedupedGen1 = TxLog.latest(spark, plan.dedupedZone).get.gen
    Pipeline.plan(spark, spec.copy(containment = 0.99)).run()
    assert(TxLog.latest(spark, plan.dedupedZone).get.gen > dedupedGen1,
      "a containment-threshold change must recompute the dedup stage")
  }

  test("a re-planned splits list cannot skip-serve the stale packing plan (watermark collision)") {
    // round-12 ADVICE: with generation-SUM watermarks, running
    // (train,valid,test) to gens (2,2,2) then re-planning (train,valid)
    // recomputes both splits to (3,3) — sum 6 == 6 — and the packed
    // stage skip-served a plan still containing 'test' rows
    val base = java.nio.file.Files.createTempDirectory("graft_lake_wm").toString
    val srcZone = s"$base/src"
    TxLog.replace(spark, srcZone,
      (0L until 60L).map(i => (i, unique(i))).toDF("doc_id", "text"))
    val spec3 = Pipeline.LakeSpec(srcZone = srcZone, lakeDir = s"$base/lake",
      splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1),
      packCapacity = 64L)
    val plan3 = Pipeline.plan(spark, spec3)
    plan3.run(); // split gens 1,1,1
    // advance the source so a second run recomputes every split: gens 2,2,2
    TxLog.append(spark, srcZone,
      (100L until 110L).map(i => (i, unique(i))).toDF("doc_id", "text"))
    plan3.run()
    assert(spec3.splits.forall { case (n, _) =>
      TxLog.latest(spark, plan3.splitZone(n)).get.gen === 2L })
    assert(plan3.packed().filter($"split" === "test").count() > 0)

    // re-plan WITHOUT the test split: the two kept splits recompute to
    // gens 3,3 (splits-conf change) — under a sum watermark 3+3 == 2+2+2
    // would skip; the named-pairs watermark + splits-bearing conf recompute
    val spec2 = spec3.copy(splits = Seq("train" -> 0.9, "valid" -> 0.1))
    val plan2 = Pipeline.plan(spark, spec2)
    plan2.run()
    assert(Seq("train", "valid").forall(n =>
      TxLog.latest(spark, plan2.splitZone(n)).get.gen === 3L),
      "precondition: the collision shape (kept splits at gen 3) must hold")
    assert(plan2.packed().filter($"split" === "test").count() === 0,
      "the packed stage must recompute for the new splits list, " +
        "never skip-serve the 3-split plan")
  }

  test("semantic tier: SemDeDup stage served from the lake's ANN index artifact, watermark-resumable") {
    val base = java.nio.file.Files.createTempDirectory("graft_lake_sem").toString
    val srcZone = s"$base/src"
    val embZone = s"$base/emb"
    val lakeDir = s"$base/lake"

    // 40 docs, all texts UNIQUE (the textual tiers keep everything);
    // embeddings are ±1 hypercube corners (pairwise cosine ≤ 0.75)
    // except the PLANTED semantic twin: doc 30 carries doc 3's exact
    // embedding under a completely different text — only the semantic
    // tier can catch it
    def emb(i: Long): Array[Float] = {
      val src = if (i == 30L) 3L else i
      Array.tabulate(8)(d =>
        if (d >= 6) 1.0f
        else if (((src >> d) & 1L) == 1L) 1.0f else -1.0f)
    }
    TxLog.replace(spark, srcZone,
      (0L until 40L).map(i => (i, unique(i))).toDF("doc_id", "text"))
    TxLog.replace(spark, embZone,
      (0L until 40L).map(i => (i, emb(i))).toDF("doc_id", "embedding")
        .select($"doc_id", $"embedding".cast("array<float>").as("embedding")))

    val spec = Pipeline.LakeSpec(srcZone = srcZone, lakeDir = lakeDir,
      nearDupJaccard = 0.8, containment = 0.95,
      splits = Seq("train" -> 0.8, "valid" -> 0.2), packCapacity = 64L,
      semantic = Some(Pipeline.SemanticSpec(embZone, threshold = 0.95)))
    val plan = Pipeline.plan(spark, spec)
    plan.run()

    // textual tiers keep all 40; the semantic tier drops exactly the twin
    assert(TxLog.read(spark, plan.dedupedZone).count() === 40L)
    val semIds = TxLog.read(spark, plan.semDedupedZone)
      .select($"doc_id").as[Long].collect().toSet
    assert(semIds.size === 39 && !semIds(30L) && semIds(3L),
      "the planted semantic duplicate (higher id) must drop, its twin survive")
    // downstream consumes the semantic tier: no split carries doc 30
    val splitIds = spec.splits.flatMap { case (n, _) =>
      TxLog.read(spark, plan.splitZone(n)).select($"doc_id").as[Long].collect() }
    assert(splitIds.toSet === semIds)
    // the index is a LAKE ARTIFACT: committed zones under <lakeDir>/annindex
    assert(TxLog.latest(spark,
      graft.operators.AnnIndex.codesZone(plan.annIndexDir)).isDefined)

    // idle re-run: every stage AND the index skip (no generation moves)
    val zones = Seq(plan.gatedZone, plan.dedupedZone, plan.semDedupedZone,
      plan.packedZone, graft.operators.AnnIndex.codesZone(plan.annIndexDir)) ++
      spec.splits.map(s => plan.splitZone(s._1))
    val before = zones.map(z => z -> TxLog.latest(spark, z).get.gen).toMap
    plan.run()
    zones.foreach(z => assert(TxLog.latest(spark, z).get.gen === before(z),
      s"idle re-run must not advance $z"))

    // fresh docs + embeddings flow through: the index refreshes
    // incrementally (codes gen advances) and the semantic stage
    // recomputes over the new era
    TxLog.append(spark, srcZone,
      Seq((60L, unique(60L))).toDF("doc_id", "text"))
    TxLog.append(spark, embZone,
      Seq((60L, emb(60L))).toDF("doc_id", "embedding")
        .select($"doc_id", $"embedding".cast("array<float>").as("embedding")))
    plan.run()
    assert(TxLog.latest(spark,
      graft.operators.AnnIndex.codesZone(plan.annIndexDir)).get.gen >
      before(graft.operators.AnnIndex.codesZone(plan.annIndexDir)),
      "new embeddings must refresh the index artifact")
    assert(TxLog.read(spark, plan.semDedupedZone)
      .select($"doc_id").as[Long].collect().toSet === (semIds + 60L))
  }
}
