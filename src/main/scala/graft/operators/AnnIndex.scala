package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The persisted ANN index — the IVF + int8-SQ stack ([[Similarity]])
  * committed to TxLog zones so a FRESH session probes without retraining
  * the corpus (round-12 directive #2; north-star surface — the reference
  * lake stores raw prefixes with no index at all,
  * `lib/dynamodb-streaming-datalake-stack.ts:199-222`).
  *
  * Layout under `indexDir` (three TxLog zones, each time-travelable):
  *  - `centroids`:  (cent_id BIGINT, ce ARRAY<FLOAT>) — the trained
  *    Lloyd's centroids (deterministic: lowest-id seeds, exact-decimal
  *    means), k rows.
  *  - `quant`:      (pos BIGINT, mn DOUBLE, mx DOUBLE) — the per-dim
  *    scalar-quantization bounds, dim rows.
  *  - `codes`:      (vec_id BIGINT, cent_id BIGINT, code ARRAY<INT>) —
  *    every corpus vector's cell assignment + int8 code, clustered by
  *    cent_id at write (`repartitionByRange`) with per-file `cent_id`
  *    stats, so a catalog/pruned read of a probe's cells opens only that
  *    cell's files at 100 TB. Zone meta carries the index contract:
  *    `ann.src` (the source corpus zone), `ann.srcgen` (the source
  *    generation the codes cover — the incremental-refresh watermark),
  *    `ann.k`, `ann.dim`.
  *
  * Everything stored round-trips parquet EXACTLY (longs, ints, floats,
  * doubles — no re-derivation), so a probe served from the stored index
  * is bit-identical to the session-cached path
  * ([[Similarity.knnJoinIvfInt8Codes]] is the shared tail; AnnIndexSpec
  * pins the equality). Refresh is INCREMENTAL: new source rows (the
  * TxLog change feed between the watermark and the head) are encoded
  * under the FROZEN centroids/bounds and appended — existing code files
  * are never rewritten, and only the new vectors' cells gain files. A
  * source rewrite (compact/replace) fails the incremental diff loudly
  * ([[TxLog.appendedBetween]]'s append-only contract) — rebuild then.
  *
  * Freezing the quantizer on refresh is the standard index contract
  * (FAISS `IndexIVF.add` after `train`): assignments stay comparable
  * across generations; drift is handled by a periodic rebuild, which
  * this operator makes a one-call `build` (replace-commits all three
  * zones; readers on older generations keep their era via time travel).
  */
object AnnIndex {

  final case class Handle(centroids: Seq[(Long, Array[Float])],
                          mins: Array[Double], maxs: Array[Double],
                          srcZone: String, srcGen: Long) {
    def dim: Int = mins.length
    def k: Int = centroids.size
  }

  private def z(indexDir: String, name: String): String =
    indexDir.stripSuffix("/") + "/" + name
  private[graft] def centroidsZone(indexDir: String): String = z(indexDir, "centroids")
  private[graft] def quantZone(indexDir: String): String = z(indexDir, "quant")
  private[graft] def codesZone(indexDir: String): String = z(indexDir, "codes")

  /** Encode a vector frame under a handle's frozen parameters:
    * (idCol, cent_id, code) — the zero-shuffle literal-argmax assignment
    * plus the map-side int8 quantization, exactly the session path's
    * encode step. */
  private def encode(vectors: DataFrame, h: Handle,
                     idCol: String, vecCol: String): DataFrame =
    Similarity.assignToCentroidsLocal(vectors, h.centroids, idCol, vecCol)
      .select(col(idCol), col("cent_id"),
        Similarity.quantizeInt8(col(vecCol), h.mins, h.maxs).as("code"))

  /** Cluster codes by cell before the file write so per-file cent_id
    * stats are tight (each file covers a narrow cell range — the layout
    * that makes probe-side file pruning real). Partition count scales
    * with the corpus, floored at the session parallelism. */
  private def clustered(codes: DataFrame): DataFrame = {
    val p = codes.sparkSession.sparkContext.defaultParallelism
    codes.repartitionByRange(p, col("cent_id"), col("vec_id"))
  }

  /** Train on the source zone's CURRENT snapshot and replace-commit all
    * three index zones. k defaults to the corpus-derived
    * [[graft.ExtendedQueries.adaptiveK]] (cells target ~1024 members —
    * the same knob the declared q170/q184 path derives). Returns the
    * handle a same-session caller can probe with immediately. */
  def build(spark: SparkSession, indexDir: String, srcZone: String,
            iterations: Int = 2, k: Option[Int] = None,
            idCol: String = "vec_id", vecCol: String = "embedding"): Handle = {
    val srcHead = TxLog.latest(spark, srcZone).getOrElse(
      sys.error(s"annindex build: $srcZone has no transaction log — " +
        "the index sources a TxLog zone (its generations drive refresh)"))
    val corpus = TxLog.readSnapshot(spark, srcZone, srcHead)
    val kk = k.getOrElse(graft.ExtendedQueries.adaptiveK(corpus.count()))
    val cents = Similarity.collectCentroids(
      Similarity.kmeans(corpus, kk, iterations, idCol, vecCol))
    val (mins, maxs) = Similarity.dimMinMax(corpus, idCol, vecCol)
    val h = Handle(cents, mins, maxs, srcZone, srcHead.gen)
    import spark.implicits._
    // The three zones commit SEPARATELY (TxLog is per-zone atomic), so a
    // rebuild seals them with one build id, written codes-LAST: a reader
    // racing the rebuild sees matching ids (all-old or all-new) or a
    // mismatch — load() refuses loudly rather than probing new centroids
    // against old codes (silently wrong cells).
    val buildId = java.util.UUID.randomUUID().toString
    val seal = Map("ann.build" -> buildId)
    TxLog.replace(spark, centroidsZone(indexDir),
      cents.toDF("cent_id", "ce")
        .select(col("cent_id"), col("ce").cast("array<float>").as("ce")),
      meta = seal)
    TxLog.replace(spark, quantZone(indexDir),
      mins.zip(maxs).zipWithIndex
        .map { case ((mn, mx), i) => (i.toLong, mn, mx) }.toSeq
        .toDF("pos", "mn", "mx"),
      meta = seal)
    TxLog.replace(spark, codesZone(indexDir),
      clustered(encode(corpus.select(col(idCol), col(vecCol)), h, idCol, vecCol)),
      meta = seal ++ Map("ann.src" -> srcZone,
        "ann.srcgen" -> srcHead.gen.toString,
        "ann.k" -> kk.toString, "ann.dim" -> mins.length.toString),
      statsCols = Seq("cent_id"))
    h
  }

  /** Load the index contract from the committed zones — two tiny
    * collects (k centroids, dim bounds) and three head resolutions; the
    * corpus is never touched. This is all a fresh session needs. The
    * build-id seal across the three zones must agree (a mismatch means
    * a rebuild is in flight or died between commits — retry or rebuild;
    * probing mixed eras would be silently wrong). */
  def load(spark: SparkSession, indexDir: String): Handle = {
    val codesHead = TxLog.latest(spark, codesZone(indexDir)).getOrElse(
      sys.error(s"annindex load: $indexDir has no committed codes zone"))
    val centsHead = TxLog.latest(spark, centroidsZone(indexDir)).getOrElse(
      sys.error(s"annindex load: $indexDir has no committed centroids zone"))
    val quantHead = TxLog.latest(spark, quantZone(indexDir)).getOrElse(
      sys.error(s"annindex load: $indexDir has no committed quant zone"))
    val seals = Seq(codesHead, centsHead, quantHead).map(_.meta.get("ann.build"))
    require(seals.distinct.size == 1,
      s"annindex load: build-id seal mismatch across the index zones " +
        s"($seals) — a rebuild is in flight or died between commits; " +
        "retry after it completes, or re-run AnnIndex.build")
    val cents = Similarity.collectCentroids(
      TxLog.readSnapshot(spark, centroidsZone(indexDir), centsHead))
    import spark.implicits._
    val qb = TxLog.readSnapshot(spark, quantZone(indexDir), quantHead)
      .select(col("pos"), col("mn"), col("mx"))
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    Handle(cents, qb.map(_._2), qb.map(_._3),
      codesHead.meta.getOrElse("ann.src",
        sys.error(s"annindex load: codes zone lacks ann.src meta")),
      codesHead.meta.getOrElse("ann.srcgen",
        sys.error(s"annindex load: codes zone lacks ann.srcgen meta")).toLong)
  }

  /** Batch k-NN join served FROM the stored index: stored codes carry
    * the cell equi-join, stored centroids/bounds drive probing and query
    * encoding, and the exact re-rank joins the |q|·refine winner ids
    * back to the source zone's floats. No training, no corpus-wide
    * encode — the probe cost is the candidate cells plus the winner
    * fetch. `corpus` defaults to the source zone's current snapshot
    * (extra unindexed rows are inert — the re-rank touches winner ids
    * only, which all come from the codes). */
  /** The code files a probed-cell SET can touch: a file is kept iff
    * some probed cell falls inside its committed cent_id [min, max] (or
    * it has no stat — never skip blind). Cells sort once; each file is
    * one binary search — O(files · log cells), no per-cell×per-file
    * product even at k ~ 10⁶ cells / 10⁵ files. */
  private[graft] def filesForCells(head: TxLog.Snapshot,
                                   cells: Array[Long]): Seq[String] = {
    val sorted = cells.sorted
    def anyIn(lo: Long, hi: Long): Boolean = {
      var i = java.util.Arrays.binarySearch(sorted, lo)
      if (i < 0) i = -i - 1
      i < sorted.length && sorted(i) <= hi
    }
    head.files.filter { f =>
      head.colStats.get(f).flatMap(_.get("cent_id")) match {
        case Some(st) => (st.min, st.max) match {
          case (Some(mn), Some(mx)) =>
            anyIn(math.floor(mn.toDouble).toLong, math.floor(mx.toDouble).toLong)
          case _ => false // entirely-null cent_id: no probe can match
        }
        case None => true
      }
    }
  }

  def knnJoin(spark: SparkSession, indexDir: String, queries: DataFrame,
              k: Int, nProbe: Int, refine: Int,
              corpus: Option[DataFrame] = None,
              idCol: String = "vec_id", vecCol: String = "embedding",
              qIdCol: String = "q_id", qVecCol: String = "qe"): DataFrame = {
    val h = load(spark, indexDir)
    val cz = codesZone(indexDir)
    val head = TxLog.latest(spark, cz).getOrElse(
      sys.error(s"annindex knnJoin: $indexDir has no committed codes zone"))
    // prune the codes read to the BATCH's probed-cell union, computed by
    // the IDENTICAL rounded-cosine ranking the scoring join uses below
    // (a driver-side unrounded ranking could disagree on a near-tie and
    // exclude a cell the probe then selects — silently missing
    // candidates). Distinct cell ids are bounded by k — a driver-safe
    // collect even at k ~ 10⁶; an eval-set batch probing a handful of
    // cells then opens a handful of files instead of the zone.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val centsDf = h.centroids.toDF("cent_id", "ce")
    val wq = Window.partitionBy(col(qIdCol))
      .orderBy(col("_cs").desc, col("cent_id"))
    val cells = queries.crossJoin(broadcast(centsDf))
      .select(col(qIdCol), col("cent_id"),
        round(graft.functions.VectorFunctions.cosine(col(qVecCol), col("ce")), 4)
          .as("_cs"))
      .withColumn("_rn", row_number().over(wq))
      .filter(col("_rn") <= nProbe)
      .select(col("cent_id")).distinct()
      .as[Long].collect()
    val keep = filesForCells(head, cells)
    val codes = (if (keep.isEmpty)
        TxLog.readSnapshot(spark, cz, head).filter(lit(false))
      else TxLog.loadFiles(spark, head,
        keep.map(f => cz.stripSuffix("/") + "/" + f)))
      .select(col(idCol), col("cent_id"), col("code").as("_code"))
    val corp = corpus.getOrElse(TxLog.read(spark, h.srcZone))
    Similarity.knnJoinIvfInt8Codes(codes, corp, queries, h.centroids,
      h.mins, h.maxs, k, nProbe, refine, idCol, vecCol, qIdCol, qVecCol)
  }

  /** Single-vector top-k probe served by a PRUNED read of the codes
    * zone — the 100 TB probe shape: the query's `nProbe` nearest cells
    * are ranked DRIVER-SIDE against the loaded centroids
    * ([[Similarity.rankCells]], the same arithmetic as the oracle
    * cosine), and only the code files whose committed `cent_id` stats
    * overlap those cells are opened (the cell-clustered write makes the
    * per-file ranges tight, so a probe touches ~nProbe cells' files out
    * of the corpus's thousands). Candidates are scored by the exact
    * int8 dot, the top `refine` join back to the source floats for the
    * exact rounded-cosine re-rank — the [[Similarity.knnJoinIvfInt8]]
    * discipline at single-probe granularity. Returns (vec_id, sim)
    * top-k plus the files-opened/files-total pruning evidence. */
  def topK(spark: SparkSession, indexDir: String, qe: Array[Float],
           k: Int, nProbe: Int, refine: Int,
           idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, (Int, Int)) = {
    require(k >= 1 && refine >= k, s"need refine >= k >= 1, got k=$k refine=$refine")
    val h = load(spark, indexDir)
    require(nProbe >= 1 && nProbe <= h.k,
      s"nProbe must be in [1, ${h.k}], got $nProbe")
    val cz = codesZone(indexDir)
    val head = TxLog.latest(spark, cz).getOrElse(
      sys.error(s"annindex topK: $indexDir has no committed codes zone"))
    val cells = Similarity.rankCells(h.centroids, qe).take(nProbe)
    // union of per-cell keep lists: each probe is a point range on the
    // committed cent_id stats (file kept iff its [min,max] covers the cell)
    val keep = cells.flatMap(c => TxLog.prunedFilesFor(head, "cent_id", c, c))
      .distinct
    val pruning = (keep.size, head.files.size)
    if (keep.isEmpty)
      return (spark.emptyDataFrame
        .select(lit(0L).as(idCol), lit(0.0).as("sim")).limit(0), pruning)
    val codes = TxLog.loadFiles(spark, head,
      keep.map(f => cz.stripSuffix("/") + "/" + f))
      .filter(col("cent_id").isin(cells: _*))
    val qCode = Similarity.quantizeInt8(
      typedLit(qe.toSeq).cast("array<float>"), h.mins, h.maxs)
    val winners = codes
      .select(col(idCol), Similarity.int8Dot(col("code"), qCode).as("_is"))
      .orderBy(col("_is").desc, col(idCol))
      .limit(refine)
      .select(col(idCol))
    val corp = TxLog.read(spark, h.srcZone).select(col(idCol), col(vecCol))
    val out = corp.join(broadcast(winners), idCol)
      .select(col(idCol), round(graft.functions.VectorFunctions.cosine(
        col(vecCol), typedLit(qe.toSeq).cast("array<float>")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
    (out, pruning)
  }

  /** Incremental refresh: encode the source rows appended since the
    * watermark under the FROZEN centroids/bounds and append them to the
    * codes zone (one commit; existing files untouched — only the new
    * vectors' cells gain files), advancing `ann.srcgen`. Returns the
    * number of newly indexed vectors (0 = already current). A source
    * compact/replace inside the window fails loudly via
    * [[TxLog.appendedBetween]]'s append-only contract — rebuild then. */
  def refresh(spark: SparkSession, indexDir: String,
              idCol: String = "vec_id", vecCol: String = "embedding"): Long = {
    val h = load(spark, indexDir)
    val srcHead = TxLog.latest(spark, h.srcZone).getOrElse(
      sys.error(s"annindex refresh: source zone ${h.srcZone} has no log"))
    if (srcHead.gen == h.srcGen) return 0L
    val fresh = TxLog.appendedBetween(spark, h.srcZone, h.srcGen, srcHead.gen)
      .select(col(idCol), col(vecCol))
    val newCodes = clustered(encode(fresh, h, idCol, vecCol))
      .localCheckpoint(true)
    val n = newCodes.count()
    if (n > 0L)
      TxLog.append(spark, codesZone(indexDir), newCodes,
        meta = Map("ann.srcgen" -> srcHead.gen.toString))
    else
      TxLog.commitMeta(spark, codesZone(indexDir), "ann-refresh",
        _ => Map("ann.srcgen" -> srcHead.gen.toString))
    Lineage.free(newCodes)
    n
  }
}
