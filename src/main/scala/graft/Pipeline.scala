package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.current_timestamp
import org.apache.spark.sql.streaming.Trigger
import graft.operators.{Cdc, FullLoad}
import graft.streaming.CdcStream

/** A17 "pipeline compilation" (SURVEY §2.1 / §3.3): the reference's
  * CDK lifecycle — construct tree (config) -> synth (plan) -> deploy
  * (execute) — re-expressed as typed config -> lazy DataFrame/stream plan
  * -> action. Validation errors surface at plan time, like CDK synth
  * (`bin/dynamodb-streaming-datalake.ts:28-68`, `cdk.json:2`).
  */
object Pipeline {

  /** CDC-zone pipeline config (the producer stack's knobs, stack.ts):
    * buffering interval = Firehose buffer (`stack.ts:211-214`), layout
    * prefixes (`stack.ts:38,221-222`). */
  final case class CdcSpec(
      inputPath: String,
      lakePath: String,
      errorPath: String,
      checkpointPath: String,
      triggerSeconds: Long = 60L,
      maxFilesPerTrigger: Option[Int] = None,
      wallClockIngestion: Boolean = false) {
    def validate(): Unit = {
      require(inputPath.nonEmpty && lakePath.nonEmpty && errorPath.nonEmpty &&
        checkpointPath.nonEmpty, "all CDC paths must be non-empty")
      require(triggerSeconds > 0, s"trigger must be positive, got $triggerSeconds")
      require(Seq(lakePath, errorPath, checkpointPath).distinct.size == 3,
        "lake/error/checkpoint paths must be distinct")
    }
  }

  /** Full-load pipeline config (the consumer stack: fleet shape drives the
    * scan split count, `ddb_full_load.py:39-47`; output partitions
    * `:67-69`). */
  final case class FullLoadSpec(
      sourcePath: String,
      destPath: String,
      workerType: String = "Standard",
      numWorkers: Int = 1,
      outputPartitions: Option[Int] = None) {
    def validate(): Unit = {
      require(sourcePath.nonEmpty && destPath.nonEmpty, "paths must be non-empty")
      require(numWorkers >= 1, s"numWorkers must be >= 1, got $numWorkers")
    }
    def splits: Int = FullLoad.splitCount(workerType, numWorkers)
  }

  /** Planned (synth'd) CDC pipeline: lazy, nothing runs until start(). */
  final class CdcPlan private[Pipeline] (spark: SparkSession, spec: CdcSpec) {
    private val clock: Option[Column] =
      if (spec.wallClockIngestion) Some(current_timestamp()) else None

    /** Execute until all currently-available input is processed. */
    def runOnce(): Unit = {
      val parsed = CdcStream.source(spark, spec.inputPath, spec.maxFilesPerTrigger)
      val q = CdcStream.pipeline(parsed, spec.lakePath, spec.errorPath,
        spec.checkpointPath, Trigger.AvailableNow(), clock).start()
      q.awaitTermination()
    }

    /** Execute continuously on the configured micro-batch interval. */
    def start(): org.apache.spark.sql.streaming.StreamingQuery = {
      val parsed = CdcStream.source(spark, spec.inputPath, spec.maxFilesPerTrigger)
      CdcStream.pipeline(parsed, spec.lakePath, spec.errorPath,
        spec.checkpointPath,
        Trigger.ProcessingTime(s"${spec.triggerSeconds} seconds"), clock).start()
    }

    private def pathExists(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
    }

    /** The lake read model over what this pipeline has written. Partition
      * columns (year/month/day/hour) survive via basePath so consumers can
      * prune by hour — the entire point of the A13 layout; the ingestion
      * clock is restored to TimestampType from its ISO JSON form. Before
      * the first batch lands this is an empty frame, not a read error. */
    def lakeZone(): DataFrame = {
      import org.apache.spark.sql.functions._
      if (!pathExists(spec.lakePath)) spark.emptyDataFrame
      else spark.read.option("basePath", spec.lakePath)
        .json(s"${spec.lakePath}/year=*/month=*/day=*/hour=*")
        .withColumn("ingestion_timestamp", to_timestamp(col("ingestion_timestamp")))
    }

    /** Empty frame (not PATH_NOT_FOUND) when no batch has had errors —
      * the normal case a health check probes. */
    def errorZone(): DataFrame =
      if (!pathExists(spec.errorPath)) spark.emptyDataFrame
      else spark.read.json(spec.errorPath)

    def snapshot(): DataFrame = {
      // Tiebreaker for equal ingestion timestamps must be deterministic
      // across runs; monotonically_increasing_id() depends on how the scan
      // bin-packs files, so ties would flip between runs. Content order
      // (the serialized attrs + event) is stable, and rows that tie on it
      // are byte-identical — either winner is the same row. (The JSON
      // source exposes no _metadata.row_index to use instead.)
      Cdc.snapshot(lakeZone(), Seq("id", "name"),
        Seq("ingestion_timestamp", "attrs_json", "Event"))
    }

    /** Lake maintenance: compact the append-only CDC zone into a columnar
      * snapshot table (the reference's full-load zone shape, A5/A6 applied
      * to the CDC read model) — overwrite parquet keyed by the table key. */
    def compact(destPath: String,
                outputPartitions: Int = Runtime.getRuntime.availableProcessors()): Unit =
      FullLoad.run(snapshot(), destPath, outputPartitions)
  }

  final class FullLoadPlan private[Pipeline] (spark: SparkSession, spec: FullLoadSpec) {
    def run(): Unit = {
      val src = spark.read.parquet(spec.sourcePath)
        .repartition(spec.splits) // the reference's scan-split parallelism (A1/A2)
      FullLoad.run(src, spec.destPath,
        spec.outputPartitions.getOrElse(Runtime.getRuntime.availableProcessors()))
    }
    def readBack(): DataFrame = FullLoad.readBack(spark, spec.destPath)
  }

  /** Training-corpus pipeline config — the engine's extension axis (the
    * north-star training-data ops) composed under the same A17 lifecycle:
    * quality gate -> exact dedup -> near-dup cluster dedup -> deterministic
    * splits -> split-partitioned lake write. Every stage is one of the
    * tested operators; the plan is lazy end-to-end. */
  final case class TrainingSpec(
      sourcePath: String,
      destPath: String,
      // idCol must be an INTEGRAL column when nearDupJaccard is set: the
      // near-dup stage labels duplicate clusters via
      // Dedup.connectedComponents, whose node ids are longs (it require-
      // fails loudly on non-integral ids). Hash free-form string ids to an
      // integral column first (e.g. HashFunctions.h32).
      idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.0,
      dedupExact: Boolean = true,
      nearDupJaccard: Option[Double] = Some(0.8),
      splits: Seq[(String, Double)] = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
      // post-write maintenance: compact each split partition to ~this many
      // bytes per file (None = leave the writer's file layout as-is)
      compactTargetBytes: Option[Long] = None,
      // write each split through the transaction log (one TxLog zone per
      // split directory): corpus refreshes become atomic per split — a
      // reader mid-refresh keeps the previous complete generation instead
      // of racing mode("overwrite")'s delete+write window
      useTxLog: Boolean = false) {
    def validate(): Unit = {
      require(sourcePath.nonEmpty && destPath.nonEmpty, "paths must be non-empty")
      require(minQuality >= 0.0 && minQuality <= 1.0, s"minQuality in [0,1], got $minQuality")
      nearDupJaccard.foreach(t =>
        require(t > 0.0 && t <= 1.0, s"near-dup threshold in (0,1], got $t"))
      require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
        "split weights must sum to 1")
      compactTargetBytes.foreach(b =>
        require(b > 0, s"compactTargetBytes must be positive, got $b"))
    }
  }

  final class TrainingPlan private[Pipeline] (spark: SparkSession, spec: TrainingSpec) {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Splits, TextAnalysis}

    /** The lazy cleaned/dedup'd/split corpus. Stage order is the cheap-
      * first scale order: the quality gate is map-side (one scan, no
      * shuffle) and shrinks everything downstream; exact dedup is one
      * hash-shuffle; near-dup (LSH + cluster labels) only ever sees the
      * exact-dedup survivors. Survivor policy is lowest id, at every
      * stage — deterministic end to end. */
    def corpus(): DataFrame = {
      val id = col(spec.idCol)
      var docs = spark.read.parquet(spec.sourcePath)
      if (spec.minQuality > 0.0)
        docs = docs.filter(
          TextAnalysis.qualityScore(TextAnalysis.tokens(col(spec.textCol))) >= spec.minQuality)
      if (spec.dedupExact) {
        val canon = Dedup.exactGroups(docs, spec.idCol, spec.textCol)
          .select(col("canonical_id").as(spec.idCol))
        docs = docs.join(canon, spec.idCol :: Nil, "left_semi")
      }
      spec.nearDupJaccard.foreach { t =>
        val pairs = Dedup.minhashNearDups(docs, spec.idCol, spec.textCol, threshold = t)
        val losers = Dedup.connectedComponents(pairs)
          .filter(col("node") =!= col("label"))   // cluster minimum survives
          .select(col("node").as(spec.idCol))
        docs = docs.join(losers, spec.idCol :: Nil, "left_anti")
      }
      Splits.assignSplit(docs, spec.idCol, spec.splits)
    }

    /** Write the corpus split-partitioned (train/valid/test directories are
      * the lake layout consumers prune on), then optionally compact each
      * split partition — the bounded per-partition rewrite unit, so a
      * consumer reading one split never races a whole-zone swap. With
      * `useTxLog` each split directory is a [[graft.operators.TxLog]]
      * zone refreshed via `replace` — the fully atomic form. */
    def run(): Unit = {
      if (spec.useTxLog) {
        // materialize once: the per-split writes would otherwise re-run
        // the whole dedup pipeline per split
        val c = corpus().localCheckpoint(true)
        spec.splits.foreach { case (name, _) =>
          val part = c.filter(col("split") === name).drop("split")
          // the split's schema rides in the manifest: a zone whose refresh
          // landed zero rows (tiny corpus × small weight) stays readable
          // as a TYPED empty relation instead of a zero-column frame
          graft.operators.TxLog.replace(spark, splitZone(name), part,
            meta = Map("schema.ddl" -> part.schema.toDDL))
        }
        spec.compactTargetBytes.foreach { target =>
          spec.splits.foreach { case (name, _) =>
            graft.operators.TxLog.compact(spark, splitZone(name), targetBytes = target)
          }
        }
      } else {
        corpus().write.mode("overwrite").partitionBy("split").parquet(spec.destPath)
        spec.compactTargetBytes.foreach { target =>
          spec.splits.foreach { case (name, _) =>
            graft.operators.Compaction.compactPartition(
              spark, spec.destPath, s"split=$name", targetBytes = target)
          }
        }
      }
    }

    private def splitZone(name: String): String =
      spec.destPath.stripSuffix("/") + s"/split=$name"

    def readBack(): DataFrame =
      if (spec.useTxLog) {
        val frames = spec.splits.flatMap { case (name, _) =>
          val zone = splitZone(name)
          val df = graft.operators.TxLog.read(spark, zone)
          if (df.schema.nonEmpty) Some(df.withColumn("split", lit(name)))
          else
            // zero-file snapshot reads as a zero-column frame, which would
            // poison the union; rebuild the typed empty relation from the
            // schema committed in the manifest (pre-schema-meta zones with
            // no data contribute nothing and are skipped)
            graft.operators.TxLog.latest(spark, zone)
              .flatMap(_.meta.get("schema.ddl")).map { ddl =>
                spark.createDataFrame(
                  spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                  org.apache.spark.sql.types.StructType.fromDDL(ddl))
                  .withColumn("split", lit(name))
              }
        }
        require(frames.nonEmpty,
          s"no split zone under ${spec.destPath} has data or a recorded schema")
        frames.reduce(_.unionByName(_))
      } else spark.read.parquet(spec.destPath)
  }

  /** The DURABLE end-to-end training lake (round-12 directive #5): the
    * reference stack's current-state zone (fake-DDB full load → shard
    * CDC → merge sink, ReferenceStackSpec's loop) extended with the LLM
    * tier — quality gate → dedup (exact + adaptive pair-stats
    * containment + MinHash/LSH clusters) → deterministic splits →
    * sequence packing — as STAGED TxLog zones under `lakeDir`:
    *
    *   <lakeDir>/gated      quality-gate survivors
    *   <lakeDir>/deduped    three-tier dedup survivors
    *   <lakeDir>/split=<s>  split-partitioned training corpus
    *   <lakeDir>/packed     (split, bin, doc_id, n_tok) packing plan
    *
    * Every stage is a replace-committed, TIME-TRAVELABLE table, and
    * every stage records the upstream generation it was computed from
    * (`stage.srcgen` meta) — re-running the plan is a WATERMARK RESUME:
    * a stage whose upstream has not moved is skipped (its zone keeps its
    * generation), so a restart after a crash, or a re-run after new CDC
    * merges land, recomputes exactly the stale suffix of the DAG.
    * Dedup survivor policy is lowest id at every tier, deterministic
    * end to end. */
  final case class LakeSpec(
      srcZone: String,
      lakeDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      minQuality: Double = 0.0,
      containment: Double = 0.8,
      nearDupJaccard: Double = 0.8,
      splits: Seq[(String, Double)] = Seq("train" -> 0.9, "valid" -> 0.05, "test" -> 0.05),
      packCapacity: Long = 512L,
      semantic: Option[SemanticSpec] = None) {
    def validate(): Unit = {
      require(srcZone.nonEmpty && lakeDir.nonEmpty, "paths must be non-empty")
      require(minQuality >= 0.0 && minQuality <= 1.0, s"minQuality in [0,1], got $minQuality")
      require(containment > 0.0 && containment <= 1.0, s"containment in (0,1], got $containment")
      require(nearDupJaccard > 0.0 && nearDupJaccard <= 1.0,
        s"near-dup threshold in (0,1], got $nearDupJaccard")
      require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
        "split weights must sum to 1")
      require(packCapacity >= 1L, s"packCapacity must be >= 1, got $packCapacity")
      semantic.foreach(_.validate())
    }
  }

  /** The optional SEMANTIC dedup tier of [[LakeSpec]] (SemDeDup, Abbas
    * et al. 2023 — the q184 pattern): drop a textual-dedup survivor iff
    * a LOWER-id survivor's embedding reaches `threshold` cosine inside
    * the same IVF cell. The cells come from the lake's OWN persistent
    * ANN index artifact (`<lakeDir>/annindex`, [[graft.operators.AnnIndex]])
    * — built once, refreshed incrementally as the embedding zone grows —
    * never a per-run k-means retrain. `embZone` is a TxLog zone keyed by
    * the SAME id column as the documents. */
  final case class SemanticSpec(
      embZone: String,
      threshold: Double = 0.95,
      vecCol: String = "embedding") {
    def validate(): Unit = {
      require(embZone.nonEmpty, "semantic.embZone must be non-empty")
      require(threshold > 0.0 && threshold <= 1.0,
        s"semantic threshold in (0,1], got $threshold")
    }
  }

  final class LakePlan private[Pipeline] (spark: SparkSession, spec: LakeSpec) {
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, GlobalOrder, Splits, TextAnalysis, TxLog}

    private def zone(name: String): String =
      spec.lakeDir.stripSuffix("/") + "/" + name
    def gatedZone: String = zone("gated")
    def dedupedZone: String = zone("deduped")
    def semDedupedZone: String = zone("semdeduped")
    def annIndexDir: String = zone("annindex")
    def splitZone(name: String): String = zone(s"split=$name")
    def packedZone: String = zone("packed")

    /** Replace-commit `zoneDir` from `compute` UNLESS its recorded
      * watermark already matches BOTH the upstream watermark AND the
      * stage's config fingerprint — the stage-level resume that makes
      * the whole plan restartable. The `conf` guard matters: a re-run
      * with a changed knob (a new containment threshold, different
      * split weights) must RECOMPUTE, never skip-serve results computed
      * under the old config. The watermark is a STRING naming every
      * upstream component (`zone:gen` pairs), not a bare sum: summed
      * generations collide — e.g. dropping a split while its sibling
      * zones advance can re-produce the same sum and skip-serve a
      * stale plan (round-12 ADVICE). Returns the stage's (possibly
      * pre-existing) head generation, a component of the next stage's
      * watermark. */
    private def stage(zoneDir: String, upstream: String, conf: String)
                     (compute: => DataFrame): Long = {
      val current = TxLog.latest(spark, zoneDir)
        .filter(h => h.meta.get("stage.srcgen").contains(upstream)
          && h.meta.get("stage.conf").contains(conf))
      current.map(_.gen).getOrElse {
        val out = compute
        TxLog.replace(spark, zoneDir, out,
          meta = Map("stage.srcgen" -> upstream,
            "stage.conf" -> conf,
            "schema.ddl" -> out.schema.toDDL)).gen
      }
    }

    /** Run (or resume) the staged pipeline; every stage zone ends
      * consistent with the source zone's current generation. */
    def run(): Unit = {
      val id = col(spec.idCol)
      val srcHead = TxLog.latest(spark, spec.srcZone).getOrElse(
        sys.error(s"training lake: ${spec.srcZone} has no transaction log"))

      // 1) quality gate: map-side, shrinks everything downstream
      val gatedGen = stage(gatedZone, s"src:${srcHead.gen}",
          s"minQuality=${spec.minQuality}") {
        val docs = TxLog.readSnapshot(spark, spec.srcZone, srcHead)
        if (spec.minQuality <= 0.0) docs
        else docs.filter(TextAnalysis.qualityScore(
          TextAnalysis.tokens(col(spec.textCol))) >= spec.minQuality)
      }

      // 2) three-tier dedup, cheap-first: exact (one hash shuffle), then
      //    adaptive pair-stats containment (self-tuning df cap — the
      //    directive-#1 knob), then LSH near-dup clusters; each tier only
      //    sees the previous tier's survivors
      val dedupedGen = stage(dedupedZone, s"gated:$gatedGen",
          s"containment=${spec.containment};jaccard=${spec.nearDupJaccard}") {
        var docs = TxLog.read(spark, gatedZone)
        val canon = Dedup.exactGroups(docs, spec.idCol, spec.textCol)
          .select(col("canonical_id").as(spec.idCol))
        docs = docs.join(canon, spec.idCol :: Nil, "left_semi")
        // containment: each pair yields at most one loser — the contained
        // side; a MUTUALLY contained pair keeps the lowest id
        val st = Dedup.pairStatsAdaptive(docs, spec.idCol, spec.textCol)
        val ca = round(col("inter").cast("double") / col("n_a"), 4)
        val cb = round(col("inter").cast("double") / col("n_b"), 4)
        val t = spec.containment
        val contained = st.select(
          when(ca >= t && (cb < t || col("a_id") > col("b_id")), col("a_id"))
            .when(cb >= t, col("b_id")).as(spec.idCol))
          .filter(id.isNotNull).distinct()
        docs = docs.join(contained, spec.idCol :: Nil, "left_anti")
        val pairs = Dedup.minhashNearDups(docs, spec.idCol, spec.textCol,
          threshold = spec.nearDupJaccard)
        val losers = Dedup.connectedComponents(pairs)
          .filter(col("node") =!= col("label")) // cluster minimum survives
          .select(col("node").as(spec.idCol))
        docs.join(losers, spec.idCol :: Nil, "left_anti")
      }

      // 2b) optional SEMANTIC tier: SemDeDup over the textual survivors,
      //    served from the lake's persistent ANN index artifact
      //    (<lakeDir>/annindex) — index maintenance (first build /
      //    incremental refresh) runs OUTSIDE the stage skip so the index
      //    tracks the embedding zone, while the stage itself watermarks
      //    on BOTH upstreams (deduped gen + index codes gen): new
      //    embeddings or a rebuilt index recompute the tier, an idle
      //    re-run skips it
      val (preSplitZone, preSplitMark) = spec.semantic match {
        case None => (dedupedZone, s"deduped:$dedupedGen")
        case Some(sem) =>
          import graft.operators.{AnnIndex, Similarity}
          val codesZone = AnnIndex.codesZone(annIndexDir)
          if (TxLog.latest(spark, codesZone).isEmpty)
            AnnIndex.build(spark, annIndexDir, sem.embZone,
              idCol = spec.idCol, vecCol = sem.vecCol)
          else
            // maintain = incremental refresh + the automated rebuild
            // trigger: embedding appends the frozen quantizer no longer
            // describes (centroid drift) or corpus growth past 2× retrain
            // the index as part of the plan run — a long-lived lake can't
            // silently probe a stale quantizer
            AnnIndex.maintain(spark, annIndexDir,
              idCol = spec.idCol, vecCol = sem.vecCol)
          val idxGen = TxLog.latest(spark, codesZone).get.gen
          val g = stage(semDedupedZone, s"deduped:$dedupedGen;codes:$idxGen",
              s"semthreshold=${sem.threshold};embzone=${sem.embZone}") {
            val docs = TxLog.read(spark, dedupedZone)
            val h = AnnIndex.load(spark, annIndexDir)
            // decide among textual SURVIVORS only (a doc must not lose to
            // a twin the textual tiers already removed), over the
            // INDEXED embedding era (the generation the codes cover)
            val emb = AnnIndex.indexedCorpus(spark, annIndexDir)
              .join(docs.select(id), spec.idCol :: Nil, "left_semi")
            val losers = Similarity.semDedupKeep(emb, sem.threshold,
                h.centroids, spec.idCol, sem.vecCol)
              .filter(col("kept") === 0).select(id)
            docs.join(losers, spec.idCol :: Nil, "left_anti")
          }
          (semDedupedZone, s"semdeduped:$g")
      }

      // 3) deterministic md5 splits, one zone per split (the lake layout
      //    consumers prune on); materialize LAZILY and once — the first
      //    split stage that actually recomputes pays the checkpoint, the
      //    rest share it, and an idle re-run (every stage skipping on its
      //    watermark) never touches the data at all
      var assignedComputed = false
      lazy val assigned = {
        assignedComputed = true
        Splits.assignSplit(
          TxLog.read(spark, preSplitZone), spec.idCol, spec.splits)
          .localCheckpoint(true)
      }
      val splitsConf = spec.splits.map { case (n, w) => s"$n=$w" }.mkString(",")
      val splitGens = spec.splits.map { case (name, _) =>
        name -> stage(splitZone(name), preSplitMark, splitsConf) {
          assigned.filter(col("split") === name).drop("split")
        }
      }
      if (assignedComputed) graft.operators.Lineage.free(assigned)

      // 4) sequence packing per split: bin = exclusive running token sum
      //    over doc_id order, divided by capacity. The prefix sum is the
      //    range-partitioned GlobalOrder scan (split-major order), made
      //    per-split by subtracting each split's own base offset — no
      //    single-partition window at any width. The watermark names
      //    every split zone with its generation, and the conf carries
      //    the splits list, so a re-planned splits set can never
      //    collide into a skip (round-12 ADVICE: the generation SUM of
      //    (train,valid,test)@(2,2,2) equals (train,valid)@(3,3))
      val packWatermark = splitGens
        .map { case (n, g) => s"$n:$g" }.mkString(",")
      stage(packedZone, packWatermark,
          s"capacity=${spec.packCapacity};splits=$splitsConf") {
        val toks = spec.splits.map { case (name, _) =>
          TxLog.read(spark, splitZone(name))
            .select(lit(name).as("split"), id.as("doc_id"),
              size(TextAnalysis.tokens(col(spec.textCol))).cast("long").as("n_tok"))
        }.reduce(_.unionByName(_))
        val cum = GlobalOrder.exclusiveRunningSum(toks,
          Seq(col("split"), col("doc_id")), "n_tok", "cum_g")
        val base = cum.groupBy("split")
          .agg(min(col("cum_g")).as("cum_base"))
        cum.join(broadcast(base), "split")
          .select(col("split"), col("doc_id"), col("n_tok"),
            floor((col("cum_g") - col("cum_base")).cast("double")
              / spec.packCapacity.toDouble).cast("long").as("bin"))
      }
      ()
    }

    /** The packing plan (split, bin, doc_id, n_tok) at the packed zone's
      * current generation. */
    def packed(): DataFrame = TxLog.read(spark, packedZone)
  }

  /** synth: validate config and return the lazy plan (plan-time failure for
    * bad config, like CDK synth). */
  def plan(spark: SparkSession, spec: CdcSpec): CdcPlan = {
    spec.validate(); new CdcPlan(spark, spec)
  }
  def plan(spark: SparkSession, spec: LakeSpec): LakePlan = {
    spec.validate(); new LakePlan(spark, spec)
  }
  def plan(spark: SparkSession, spec: FullLoadSpec): FullLoadPlan = {
    spec.validate(); new FullLoadPlan(spark, spec)
  }
  def plan(spark: SparkSession, spec: TrainingSpec): TrainingPlan = {
    spec.validate(); new TrainingPlan(spark, spec)
  }
}
