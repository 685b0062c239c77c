package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{AnnIndex, Similarity, TxLog}

/** The persisted ANN index (round-12 directive #2): build commits
  * centroids + quant bounds + int8 codes to TxLog zones; a FRESH session
  * probes from the committed zones without retraining, bit-identical to
  * the session-computed path; refresh encodes only the source's appended
  * rows under the frozen quantizer and appends — existing code files are
  * never rewritten. */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("annidx").toString

  /** Deterministic clustered corpus: 4 obvious direction-clusters in
    * dim 8 (so IVF cells are meaningful), float-exact values. */
  private def vecs(ids: Range): DataFrame =
    ids.map { i =>
      val c = i % 4
      val base = Array.tabulate(8)(d =>
        (if (d == c * 2) 1.0f else 0.1f) + (i % 7) * 0.01f + d * 0.001f)
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  private def queries(ids: Seq[Int]): DataFrame =
    ids.map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(8)(d =>
        (if (d == c * 2) 0.9f else 0.12f) + d * 0.002f))
    }.toDF("q_id", "qe")
      .select(col("q_id"), col("qe").cast("array<float>").as("qe"))

  private def norm(df: DataFrame): Seq[(Long, Long, Double, Long)] =
    df.select(col("q_id"), col("vec_id"), col("sim"), col("rank"))
      .as[(Long, Long, Double, Long)].collect().toSeq.sorted

  test("stored-index probes are bit-identical to the session path; fresh session needs no retraining") {
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 200))
    val h = AnnIndex.build(spark, idxDir, srcZone, iterations = 2, k = Some(4))
    assert(h.k === 4 && h.dim === 8)

    val q = queries(Seq(1000, 1001, 1002))
    val corpus = TxLog.read(spark, srcZone)
    val session = Similarity.knnJoinIvfInt8(corpus, q, h.centroids,
      h.mins, h.maxs, k = 5, nProbe = 2, refine = 10)
    val stored = AnnIndex.knnJoin(spark, idxDir, q,
      k = 5, nProbe = 2, refine = 10)
    assert(norm(stored) === norm(session),
      "stored-index probe must equal the session-computed path bit for bit")

    // a FRESH session: only the committed zones, no training state
    val fresh = spark.newSession()
    val h2 = AnnIndex.load(fresh, idxDir)
    assert(h2.centroids.map(_._1) === h.centroids.map(_._1))
    assert(h2.centroids.map(_._2.toSeq) === h.centroids.map(_._2.toSeq),
      "committed centroids must round-trip exactly")
    assert(h2.mins.toSeq === h.mins.toSeq && h2.maxs.toSeq === h.maxs.toSeq)
    val freshQ = queries(Seq(1000, 1001, 1002))
    assert(norm(AnnIndex.knnJoin(fresh, idxDir, freshQ,
        k = 5, nProbe = 2, refine = 10)) === norm(session),
      "a fresh session must answer probes from the committed zones alone")
  }

  test("incremental refresh encodes only appended rows; existing code files untouched") {
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 200))
    val h = AnnIndex.build(spark, idxDir, srcZone, iterations = 2, k = Some(4))
    val codesZone = AnnIndex.codesZone(idxDir)
    val before = TxLog.latest(spark, codesZone).get

    // already current -> 0, meta-only watermark stays
    assert(AnnIndex.refresh(spark, idxDir) === 0L)
    assert(TxLog.latest(spark, codesZone).get.files.toSet === before.files.toSet)

    // append 40 new vectors to the SOURCE zone, refresh
    TxLog.append(spark, srcZone, vecs(200 until 240))
    assert(AnnIndex.refresh(spark, idxDir) === 40L)
    val after = TxLog.latest(spark, codesZone).get
    assert(before.files.toSet.subsetOf(after.files.toSet),
      "refresh must append — never rewrite committed code files")
    assert(after.meta("ann.srcgen").toLong ===
      TxLog.latest(spark, srcZone).get.gen)
    // the appended code rows are exactly the new vectors
    val appended = TxLog.appendedBetween(spark, codesZone, before.gen, after.gen)
    assert(appended.select("vec_id").as[Long].collect().sorted.toSeq ===
      (200L until 240L))

    // post-refresh probes equal a session run with the FROZEN quantizer
    // over the full corpus (the index contract: train once, add after)
    val q = queries(Seq(2000, 2001))
    val full = TxLog.read(spark, srcZone)
    val session = Similarity.knnJoinIvfInt8(full, q, h.centroids,
      h.mins, h.maxs, k = 5, nProbe = 2, refine = 10)
    assert(norm(AnnIndex.knnJoin(spark, idxDir, q,
      k = 5, nProbe = 2, refine = 10)) === norm(session))
  }

  test("a source rewrite inside the refresh window fails loudly (rebuild then)") {
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 100))
    AnnIndex.build(spark, idxDir, srcZone, iterations = 1, k = Some(4))
    TxLog.replace(spark, srcZone, vecs(0 until 50))
    val e = intercept[RuntimeException] { AnnIndex.refresh(spark, idxDir) }
    assert(e.getMessage.contains("append-only"),
      s"expected the append-only contract to refuse, got: ${e.getMessage}")
    // rebuild recovers: replace-commits all three zones in place
    val h2 = AnnIndex.build(spark, idxDir, srcZone, iterations = 1, k = Some(4))
    assert(AnnIndex.load(spark, idxDir).srcGen === h2.srcGen)
  }

  test("single-vector topK serves from a PRUNED read of only the probed cells' files") {
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 200))
    val h = AnnIndex.build(spark, idxDir, srcZone, iterations = 2, k = Some(4))
    val qe = Array.tabulate(8)(d => (if (d == 2) 0.9f else 0.12f) + d * 0.002f)
    val (top, (kept, total)) = AnnIndex.topK(spark, idxDir, qe,
      k = 5, nProbe = 2, refine = 10)
    // pruning is real: 2 of 4 cells -> strictly fewer files than the zone
    assert(kept < total, s"probe must not open every code file: $kept/$total")
    // and the result equals the session-computed path for the same query
    val q = Seq((0L, qe)).toDF("q_id", "qe")
      .select(col("q_id"), col("qe").cast("array<float>").as("qe"))
    val session = Similarity.knnJoinIvfInt8(TxLog.read(spark, srcZone), q,
        h.centroids, h.mins, h.maxs, k = 5, nProbe = 2, refine = 10)
      .select(col("vec_id"), col("sim"), col("rank")).orderBy(col("rank"))
      .as[(Long, Double, Long)].collect().map(t => (t._1, t._2)).toSeq
    val stored = top.as[(Long, Double)].collect().toSeq
    assert(stored === session,
      "pruned-probe topK must equal the session knnJoinIvfInt8 result")
  }

  test("batch knnJoin prunes the codes read by the probed-cell union") {
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 200))
    AnnIndex.build(spark, idxDir, srcZone, iterations = 2, k = Some(4))
    val head = TxLog.latest(spark, AnnIndex.codesZone(idxDir)).get
    // the cell-set file filter: a single out-of-range cell keeps nothing
    assert(AnnIndex.filesForCells(head, Array(999L)).isEmpty,
      "a cell no file's stats cover must prune everything")
    // each real cell keeps a strict subset; their union covers the zone
    val perCell = (0L until 4L).map(c =>
      AnnIndex.filesForCells(head, Array(c)).toSet)
    assert(perCell.exists(_.size < head.files.size),
      "per-cell keep lists must prune (cell-clustered layout)")
    assert(perCell.reduce(_ ++ _) === head.files.toSet,
      "the union over all cells must cover every code file")
    // and the pruned batch path stays CORRECT: results equal the
    // unpruned corpus-side computation (superset-safe pruning)
    val h = AnnIndex.load(spark, idxDir)
    val q = queries(Seq(3000))
    val pruned = AnnIndex.knnJoin(spark, idxDir, q, k = 5, nProbe = 1, refine = 8)
    val session = Similarity.knnJoinIvfInt8(TxLog.read(spark, srcZone), q,
      h.centroids, h.mins, h.maxs, k = 5, nProbe = 1, refine = 8)
    assert(norm(pruned) === norm(session))
  }

  test("a rebuild killed between commits is INVISIBLE: readers stay on the last complete era") {
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 200))
    AnnIndex.build(spark, idxDir, srcZone, iterations = 2, k = Some(4))
    val qe = Array.tabulate(8)(d => (if (d == 2) 0.9f else 0.12f) + d * 0.002f)
    val (before, _) = AnnIndex.topK(spark, idxDir, qe, k = 5, nProbe = 2, refine = 10)
    val beforeRows = before.as[(Long, Double)].collect().toSeq
    val manifestGen = TxLog.latest(spark, AnnIndex.manifestZone(idxDir)).get.gen

    // simulate a rebuild that died after re-committing centroids AND
    // quant with its new seal — codes and the manifest never landed
    // (the worst half-build: two of three data zones on the new era)
    val torn = Map("ann.build" -> "died-mid-rebuild")
    TxLog.replace(spark, AnnIndex.centroidsZone(idxDir),
      vecs(0 until 4).toDF("cent_id", "ce"), meta = torn)
    TxLog.commitMeta(spark, AnnIndex.quantZone(idxDir), "torn-rebuild", _ => torn)

    // the manifest still names the complete era: load serves it, and a
    // probe answers EXACTLY what it answered before the kill
    assert(TxLog.latest(spark, AnnIndex.manifestZone(idxDir)).get.gen === manifestGen,
      "a half-build must not have advanced the manifest")
    assert(AnnIndex.load(spark, idxDir).k === 4)
    val (after, _) = AnnIndex.topK(spark, idxDir, qe, k = 5, nProbe = 2, refine = 10)
    assert(after.as[(Long, Double)].collect().toSeq === beforeRows,
      "probes through a torn rebuild must serve the last complete era unchanged")

    // the next successful build commits a new manifest and takes over
    val h2 = AnnIndex.build(spark, idxDir, srcZone, iterations = 1, k = Some(4))
    assert(TxLog.latest(spark, AnnIndex.manifestZone(idxDir)).get.gen > manifestGen)
    assert(AnnIndex.load(spark, idxDir).centroids.map(_._1) ===
      h2.centroids.map(_._1))

    // integrity cross-check: a manifest STITCHING mixed eras (operator
    // error) refuses loudly instead of probing wrong cells
    val gens = TxLog.read(spark, AnnIndex.manifestZone(idxDir))
      .as[(String, Long)].collect().toMap
    TxLog.replace(spark, AnnIndex.manifestZone(idxDir),
      gens.updated("centroids", 1L).toSeq.toDF("zone", "gen"),
      meta = TxLog.latest(spark, AnnIndex.manifestZone(idxDir)).get.meta)
    val e = intercept[IllegalArgumentException] { AnnIndex.load(spark, idxDir) }
    assert(e.getMessage.contains("stitches mixed eras"),
      s"expected the stitched-manifest refusal, got: ${e.getMessage}")
    AnnIndex.build(spark, idxDir, srcZone, iterations = 1, k = Some(4))
    assert(AnnIndex.load(spark, idxDir).k === 4)
  }

  test("topK and knnJoin probe the SAME cells on a rounded near-tie") {
    // two centroid directions whose cosines to the query agree at 4 dp
    // but differ beyond it: the unrounded ranking prefers the exact-match
    // HIGH cid, the rounded ranking ties and breaks to the LOW cid — the
    // round-12 divergence between the two public probe paths. Build a
    // corpus whose k-means (k=2, ids 0/1 as seeds) lands one centroid on
    // each direction exactly.
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    val a = Array(1.0f, 0.0f, 0f, 0f, 0f, 0f, 0f, 0f)           // cluster A
    val b = Array(1.0f, 0.001f, 0f, 0f, 0f, 0f, 0f, 0f)         // cluster B: cos(q,b)≈0.9999995
    val rows = Seq(0L -> b, 1L -> a, 2L -> b, 3L -> a)          // seed 0 = b, seed 1 = a
    TxLog.append(spark, srcZone,
      rows.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")))
    AnnIndex.build(spark, idxDir, srcZone, iterations = 1, k = Some(2))
    val h = AnnIndex.load(spark, idxDir)
    val qe = a // cos to centroid(a-dir) = 1.0 exact; to b-dir ≈ 0.9999995
    // precondition: a genuine near-tie — unrounded cosines differ,
    // rounded cosines agree
    val unrounded = Similarity.rankCells(h.centroids, qe)
    val rounded = Similarity.rankCellsRounded(h.centroids, qe)
    assert(rounded.head === math.min(rounded.head, rounded.last),
      "rounded ranking must break the 4-dp tie to the LOWEST cid")
    assert(unrounded.head !== rounded.head,
      "precondition: the tie must be real (unrounded ranking disagrees)")
    // both probe paths, nProbe=1: same cell, same answer
    val (top, _) = AnnIndex.topK(spark, idxDir, qe, k = 2, nProbe = 1, refine = 4)
    val q = Seq((7L, qe)).toDF("q_id", "qe")
      .select(col("q_id"), col("qe").cast("array<float>").as("qe"))
    val batch = AnnIndex.knnJoin(spark, idxDir, q, k = 2, nProbe = 1, refine = 4)
    assert(top.as[(Long, Double)].collect().toSeq ===
      batch.orderBy(col("rank")).select(col("vec_id"), col("sim"))
        .as[(Long, Double)].collect().toSeq,
      "the single-vector and batch probe paths must agree on a near-tie")
  }

  test("shouldRebuild: drifted appends trip the predicate, rebuild clears it, undrifted appends don't") {
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 200))
    AnnIndex.build(spark, idxDir, srcZone, iterations = 2, k = Some(4))
    val h0 = AnnIndex.health(spark, idxDir)
    assert(math.abs(h0.drift) < 1e-9 && h0.growth === 0.0,
      s"a fresh build is its own baseline, got $h0")
    assert(!AnnIndex.shouldRebuild(spark, idxDir))

    // UNDRIFTED appends: more rows from the same generator/distribution
    TxLog.append(spark, srcZone, vecs(200 until 280))
    assert(AnnIndex.refresh(spark, idxDir) === 80L)
    assert(!AnnIndex.shouldRebuild(spark, idxDir),
      s"same-distribution appends must not trip: ${AnnIndex.health(spark, idxDir)}")

    // DRIFTED appends: a new dominant direction the frozen centroids
    // never saw drags its cell's dequantized mean off the centroid
    val drifted = (1000 until 1400).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d >= 6) -1.0f else -0.05f))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    TxLog.append(spark, srcZone, drifted)
    assert(AnnIndex.refresh(spark, idxDir) === 400L)
    val hd = AnnIndex.health(spark, idxDir)
    assert(hd.drift > 0.02, s"drifted appends must move the signal, got $hd")
    assert(AnnIndex.shouldRebuild(spark, idxDir))

    // maintain = refresh + conditional rebuild; the rebuild resets the
    // baseline so the predicate clears
    assert(AnnIndex.maintain(spark, idxDir, k = Some(8)) === "rebuilt")
    assert(!AnnIndex.shouldRebuild(spark, idxDir),
      s"a rebuild must clear the predicate: ${AnnIndex.health(spark, idxDir)}")
    assert(AnnIndex.maintain(spark, idxDir, k = Some(8)) === "current",
      "an idle maintain must do nothing")

    // growth alone (no drift) also trips past maxGrowth
    val h1 = AnnIndex.health(spark, idxDir)
    assert(h1.growth === 0.0)
    TxLog.append(spark, srcZone, vecs(2000 until 2680))
    AnnIndex.refresh(spark, idxDir)
    assert(AnnIndex.shouldRebuild(spark, idxDir, driftTol = 1.0, maxGrowth = 0.5),
      "doubling the corpus must trip the growth guard")
  }

  test("default re-rank reads the source AT THE INDEXED GENERATION (a later rewrite can't skew results)") {
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 200))
    AnnIndex.build(spark, idxDir, srcZone, iterations = 2, k = Some(4))
    val q = queries(Seq(4000, 4001))
    val before = norm(AnnIndex.knnJoin(spark, idxDir, q, k = 5, nProbe = 2, refine = 10))

    // REWRITE the source (replace with a skewed half) — pre-fix, winner
    // ids vanished from the re-rank join (fewer than k rows, silently)
    TxLog.replace(spark, srcZone, vecs(0 until 50))
    val after = norm(AnnIndex.knnJoin(spark, idxDir, q, k = 5, nProbe = 2, refine = 10))
    assert(after === before,
      "the default probe must serve the indexed era, not the rewritten head")
    assert(AnnIndex.indexedCorpus(spark, idxDir).count() === 200L,
      "indexedCorpus must time-travel to ann.srcgen")
  }

  test("refresh after a torn rebuild seals from the manifest's generations, not raw heads") {
    // round-13 ADVICE (medium): refresh used to commit its manifest from
    // the RAW centroids/quant heads — after a rebuild died between
    // commits, those heads carry the torn era, so the refreshed manifest
    // stitched mixed eras and resolve() bricked the index until a full
    // rebuild. Now the recorded generations come from the manifest.
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 200))
    AnnIndex.build(spark, idxDir, srcZone, iterations = 2, k = Some(4))
    // a rebuild died after replacing centroids AND quant under its new
    // seal — codes and the manifest never landed
    val torn = Map("ann.build" -> "died-mid-rebuild")
    TxLog.replace(spark, AnnIndex.centroidsZone(idxDir),
      vecs(0 until 4).toDF("cent_id", "ce"), meta = torn)
    TxLog.commitMeta(spark, AnnIndex.quantZone(idxDir), "torn-rebuild", _ => torn)

    // refresh across a source append must succeed AND leave a loadable
    // index: its manifest names the COMPLETE era's generations
    TxLog.append(spark, srcZone, vecs(200 until 240))
    assert(AnnIndex.refresh(spark, idxDir) === 40L)
    val h = AnnIndex.load(spark, idxDir) // pre-fix: "stitches mixed eras"
    assert(h.k === 4)
    val q = queries(Seq(5000))
    assert(AnnIndex.knnJoin(spark, idxDir, q, k = 5, nProbe = 2, refine = 10)
      .count() === 5L)
  }

  test("refresh onto a torn CODES head refuses loudly; maintain rebuilds instead") {
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 200))
    AnnIndex.build(spark, idxDir, srcZone, iterations = 2, k = Some(4))
    // a rebuild died right after its CODES replace — the codes head is
    // on the unborn era; an append there would physically mix eras
    val h0 = AnnIndex.load(spark, idxDir)
    val tornCodes = graft.operators.Similarity
      .assignToCentroidsLocal(vecs(0 until 10), h0.centroids)
      .select(col("vec_id"), col("cent_id"),
        graft.operators.Similarity.quantizeInt8(col("embedding"), h0.mins, h0.maxs)
          .as("code"))
    TxLog.replace(spark, AnnIndex.codesZone(idxDir), tornCodes,
      meta = Map("ann.build" -> "died-mid-rebuild"))

    TxLog.append(spark, srcZone, vecs(200 until 240))
    val e = intercept[RuntimeException] { AnnIndex.refresh(spark, idxDir) }
    assert(e.getMessage.contains("mix eras"),
      s"expected the torn-codes-head refusal, got: ${e.getMessage}")
    // maintain reseals a fresh era and the index answers again
    assert(AnnIndex.maintain(spark, idxDir, k = Some(4)) === "rebuilt")
    assert(AnnIndex.load(spark, idxDir).srcGen ===
      TxLog.latest(spark, srcZone).get.gen)
    val q = queries(Seq(6000))
    assert(AnnIndex.knnJoin(spark, idxDir, q, k = 5, nProbe = 2, refine = 10)
      .count() === 5L)
  }

  test("a legacy pre-manifest index gains a MEASURED drift baseline on first refresh") {
    // round-13 ADVICE (low): health() on a pre-manifest index baselined
    // builtN/builtCos to the CURRENT values, so drift/growth were
    // permanently 0 and the automated rebuild guard could never trip.
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 200))
    AnnIndex.build(spark, idxDir, srcZone, iterations = 2, k = Some(4))
    // simulate a pre-manifest index: drop the manifest zone entirely
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    rmrf(new java.io.File(AnnIndex.manifestZone(idxDir)))
    assert(AnnIndex.load(spark, idxDir).k === 4, "legacy head+seal path must serve")

    // drifted appends, then the first refresh: it must measure the
    // PRE-append state as the baseline and record it in the new manifest
    val drifted = (1000 until 1400).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d >= 6) -1.0f else -0.05f))
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    TxLog.append(spark, srcZone, drifted)
    assert(AnnIndex.refresh(spark, idxDir) === 400L)
    val mh = TxLog.latest(spark, AnnIndex.manifestZone(idxDir)).get
    assert(mh.meta.get("ann.built.n").map(_.toLong) === Some(200L),
      "the measured baseline must cover the PRE-append corpus")
    val hl = AnnIndex.health(spark, idxDir)
    assert(hl.builtN === 200L && hl.n === 600L && hl.growth > 1.0)
    assert(hl.drift > 0.02,
      s"drift must be measured against the recorded baseline, got $hl")
    assert(AnnIndex.shouldRebuild(spark, idxDir),
      "the rebuild guard must trip on a drifted legacy index after its first refresh")
  }

  test("idle maintain is metadata-only: zero code files read (health memo)") {
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 200))
    AnnIndex.build(spark, idxDir, srcZone, iterations = 2, k = Some(4))
    val before = AnnIndex.health(spark, idxDir)
    assert(AnnIndex.maintain(spark, idxDir) === "current")

    // move every committed code file away: any read would now fail, so
    // a passing maintain PROVES the idle path never opens one
    val codesDir = new java.io.File(AnnIndex.codesZone(idxDir))
    val head = TxLog.latest(spark, AnnIndex.codesZone(idxDir)).get
    val moved = head.files.map { f =>
      val src = new java.io.File(codesDir, f)
      val dst = new java.io.File(codesDir, f + ".hidden")
      assert(src.isFile && src.renameTo(dst), s"could not hide $src")
      (dst, src)
    }
    try {
      assert(AnnIndex.maintain(spark, idxDir) === "current",
        "an idle maintain must resolve entirely from metadata")
      val memoized = AnnIndex.health(spark, idxDir)
      assert(memoized === before,
        "the memoized health must equal the originally measured scan")
    } finally moved.foreach { case (dst, src) => dst.renameTo(src) }

    // and the memo INVALIDATES when codes actually change: new appends
    // at a new generation force a fresh scan whose growth registers
    TxLog.append(spark, srcZone, vecs(200 until 300))
    assert(AnnIndex.refresh(spark, idxDir) === 100L)
    val after = AnnIndex.health(spark, idxDir)
    assert(after.n === 300L && after.builtN === 200L,
      s"a moved codes gen must re-measure, got $after")
    // the fresh scan memoizes too: hide the files again and re-read
    val head2 = TxLog.latest(spark, AnnIndex.codesZone(idxDir)).get
    val moved2 = head2.files.map { f =>
      val src = new java.io.File(codesDir, f)
      val dst = new java.io.File(codesDir, f + ".hidden")
      assert(src.isFile && src.renameTo(dst), s"could not hide $src")
      (dst, src)
    }
    try assert(AnnIndex.health(spark, idxDir) === after,
      "a re-read at the same codes gen must serve the memo, not the files")
    finally moved2.foreach { case (dst, src) => dst.renameTo(src) }
  }

  test("cellMasks tolerate null-embedding codes; cellMasksFor ladders on the survivor subset") {
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    // 40 embeddable vectors in 4 clusters plus 2 null-embedding docs —
    // the encode path null-propagates their cent_id into the codes zone
    // (the kept/cent_id=-1 input class the rest of the lake supports),
    // and the mask decode must not crash on that null group (round-15
    // ADVICE, medium)
    val nulls = Seq((1000L, null: Array[Float]), (1001L, null: Array[Float]))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    TxLog.append(spark, srcZone, vecs(0 until 40).unionByName(nulls))
    AnnIndex.build(spark, idxDir, srcZone, iterations = 2, k = Some(4))
    assert(TxLog.read(spark, AnnIndex.codesZone(idxDir))
        .filter(col("cent_id").isNull).count() === 2L,
      "fixture: null embeddings must land as null-cent_id codes rows")
    // 4 cells of ~10 > maxCell=4 -> every cell gets a non-zero mask
    val masks = AnnIndex.cellMasks(spark, idxDir, maxCell = 4)
    assert(masks.nonEmpty && masks.values.forall(_ != 0L),
      s"over-maxCell cells must ladder: $masks")
    // the SURVIVOR-restricted ladder (round-15 directive #5): 1 doc per
    // cell -> at/under maxCell everywhere -> no masks at all
    val fewMasks = AnnIndex.cellMasksFor(spark, idxDir,
      Seq(0L, 1L, 2L, 3L).toDF("vec_id"), "vec_id", maxCell = 4)
    assert(fewMasks.isEmpty,
      s"survivor occupancy at/under maxCell must not split: $fewMasks")
  }

  test("codes zone carries per-file cent_id stats for probe-side pruning") {
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 200))
    AnnIndex.build(spark, idxDir, srcZone, iterations = 2, k = Some(4))
    val head = TxLog.latest(spark, AnnIndex.codesZone(idxDir)).get
    assert(head.meta.get("stats.cols").exists(_.split(",").contains("cent_id")),
      "build must track cent_id stats")
    assert(head.files.nonEmpty && head.colStats.nonEmpty,
      "per-file stats must be committed")
    assert(head.files.forall(f => head.colStats.get(f).exists(_.contains("cent_id"))),
      "every code file needs a cent_id stat entry")
  }
}
