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

  test("a torn rebuild (seal mismatch across zones) refuses to load") {
    val srcZone = tmp() + "/corpus"
    val idxDir = tmp() + "/idx"
    TxLog.append(spark, srcZone, vecs(0 until 100))
    AnnIndex.build(spark, idxDir, srcZone, iterations = 1, k = Some(4))
    // simulate a rebuild that died after re-committing the centroids:
    // its new seal never reached quant/codes
    TxLog.commitMeta(spark, AnnIndex.centroidsZone(idxDir), "torn-rebuild",
      _ => Map("ann.build" -> "half-finished"))
    val e = intercept[IllegalArgumentException] { AnnIndex.load(spark, idxDir) }
    assert(e.getMessage.contains("seal mismatch"),
      s"mixed-era index zones must refuse, got: ${e.getMessage}")
    // a full rebuild re-seals all three and recovers
    AnnIndex.build(spark, idxDir, srcZone, iterations = 1, k = Some(4))
    assert(AnnIndex.load(spark, idxDir).k === 4)
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
