package graft.sources

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.graft.StreamBridge
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.operators.TxLog

/** TxLog zone as a Structured Streaming SOURCE — the read half of the
  * lake's streaming loop ([[graft.operators.TxLog.cdcMergeSink]] streams
  * in; this streams out): every committed generation becomes a stream
  * offset, every micro-batch is the file DIFF between two generations,
  * so a downstream consumer (a sync, a maintained index, a feature
  * pipeline) pays for the delta, never the zone. Semantics of Delta's
  * streaming source, built on this log's primitives:
  *
  *  - Offsets are generation numbers. With no `startingGen` option the
  *    first batch serves the FULL head snapshot — including files
  *    already live in the zone's start generation, so a zone brought
  *    under the log via `TxLog.init` over an existing directory streams
  *    its complete initial state (true Delta semantics: snapshot, then
  *    deltas). An EXPLICIT `startingGen=G` means "changes after
  *    generation G" (Delta's `startingVersion` + 1): the first batch is
  *    the file diff from G to the head, skipping history at and before
  *    G. Each later batch serves exactly the files the new generations
  *    added.
  *  - APPEND-ONLY contract, enforced loudly: a compact/replace/merge/
  *    delete inside a batch's generation window rewrites history — a
  *    file-level diff would double- or under-count, so the batch fails
  *    with the [[graft.operators.TxLog.appendedBetween]] error instead
  *    of silently corrupting the stream (Delta's `ignoreChanges` tradeoff,
  *    resolved for correctness). Run maintenance on a separate zone
  *    boundary or restart the stream from a fresh starting generation.
  *  - The schema is pinned at source creation (streaming requires a
  *    fixed schema); files written before a column evolution surface
  *    nulls through the explicit schema, exactly like the batch reader.
  *  - Offsets come back as [[SerializedOffset]] after a checkpoint
  *    restart; both forms decode to the generation number, so restart
  *    resumes from the last COMMITTED generation — exactly-once delivery
  *    into an idempotent sink.
  *
  * Usage: `spark.readStream.format("graft.sources.TxLogStreamProvider")
  * .option("zone", path).load()`.
  *
  * Reference anchor: the reference's consumers re-scan the raw S3 prefix
  * layout on a schedule (`lib/consumer-components.ts:86-110` Glue jobs);
  * this replaces rescans with manifest-driven incremental delivery. */
class TxLogStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "txlog"

  private def zoneOf(parameters: Map[String, String]): String =
    parameters.getOrElse("zone",
      throw new IllegalArgumentException(
        "txlog stream source requires option 'zone' (the zone path)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val zone = zoneOf(parameters)
    val s = schema.getOrElse {
      val spark = sqlContext.sparkSession
      val head = TxLog.latest(spark, zone).getOrElse(
        throw new IllegalArgumentException(
          s"txlog stream source: $zone has no transaction log yet"))
      TxLog.zoneSchema(head).getOrElse(TxLog.readSnapshot(spark, zone, head).schema)
    }
    (s"txlog[$zone]", s)
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val zone = zoneOf(parameters)
    val fixed = sourceSchema(sqlContext, schema, providerName, parameters)._2
    new TxLogSource(sqlContext, zone, fixed,
      parameters.get("startingGen").map(_.toLong),
      parameters.get("maxGensPerBatch").map(_.toLong))
  }
}

class TxLogSource(sqlContext: SQLContext, zone: String,
                  override val schema: StructType,
                  startingGen: Option[Long],
                  maxGensPerBatch: Option[Long] = None) extends Source with Logging {

  require(maxGensPerBatch.forall(_ >= 1L),
    s"maxGensPerBatch must be >= 1, got $maxGensPerBatch")

  private val spark = sqlContext.sparkSession

  /** The newest generation this source has OFFERED as a batch end —
    * the anchor the `maxGensPerBatch` backpressure caps against (the
    * A11 rate-limit analog: a consumer restarted after a long gap
    * catches up in bounded bites instead of one giant batch). Unknown
    * until the first getBatch of a run; the first offer after a cold
    * start is uncapped (the initial snapshot is one batch by design) —
    * the same best-effort contract as the file source's
    * maxFilesPerTrigger. */
  private var lastEnd: Option[Long] = None

  private def genOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => sys.error(s"txlog source: unexpected offset type $other")
  }

  override def getOffset: Option[Offset] =
    TxLog.latest(spark, zone).map(_.gen)
      // default mode must fire even at the start generation itself — the
      // initial snapshot is a batch; explicit startingGen=G streams only
      // generations AFTER G
      .filter(h => startingGen.forall(h > _))
      .map { h =>
        // cap only against an end this RUN has offered: anchoring on
        // startingGen after a restart could offer an offset below the
        // checkpoint-committed one (offset regression) — so the first
        // offer of a run is uncapped, like maxFilesPerTrigger
        (maxGensPerBatch, lastEnd) match {
          case (Some(m), Some(b)) => math.min(h, b + m)
          case _ => h
        }
      }
      .map(LongOffset(_))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val toGen = genOf(end)
    lastEnd = Some(toGen)
    val batch = (start, startingGen) match {
      // first batch, default mode: the FULL snapshot at `end` — serves a
      // non-empty start generation (init over an existing directory)
      // instead of silently dropping it, and needs no append-only window
      // (a full read diffs nothing)
      case (None, None) =>
        TxLog.readSnapshot(spark, zone,
          TxLog.snapshotAt(spark, zone, toGen).getOrElse(
            sys.error(s"txlog source: $zone generation $toGen is gone " +
              "(vacuumed?) — cannot serve the initial snapshot")))
      // explicit changes-after-G, and every later batch: the file diff
      // between the two committed generations — loudly append-only (see
      // class doc)
      case (_, _) =>
        val fromGen = start.map(genOf).orElse(startingGen).get
        TxLog.appendedBetween(spark, zone, fromGen, toGen)
    }
    // project to the pinned source schema (the read already applies the
    // log schema, so evolved-away or added columns surface correctly);
    // an empty diff still needs a valid (empty) STREAMING frame, hence
    // the bridge in all branches
    val conformed = batch.selectExpr(schema.fieldNames.map(n => s"`$n`").toSeq: _*)
    StreamBridge.streamingDataFrame(spark,
      conformed.queryExecution.toRdd, schema)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"TxLogSource[$zone${startingGen.fold("")(g => s" after gen $g")}]"
}
