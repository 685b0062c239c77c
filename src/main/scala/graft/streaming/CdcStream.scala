package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.operators.Cdc

/** The reference's four-service CDC topology (DDB stream -> Kinesis ->
  * Firehose+Lambda -> S3) collapsed into ONE Structured Streaming pipeline
  * (SURVEY.md §3.1):
  *
  *   readStream(JSON lines) -> parse -> split(valid/error) -> transform
  *     -> foreachBatch { ok -> gzip JSON hour-partitioned CDC zone;
  *                       err -> error zone (reason-keyed) }
  *
  * Semantics carried over from the reference:
  *  - 60 s micro-batch trigger = Firehose buffering interval
  *    (`lib/dynamodb-streaming-datalake-stack.ts:211-214,236-243`).
  *  - error rows are routed, never dropped (error prefix, `stack.ts:221`);
  *    our routing is row-level rather than batch-level (SURVEY §7.4).
  *  - at-least-once upstream + lake-side dedupe: the checkpointed file
  *    sink gives exactly-once on the ok path; Q28's snapshot/compaction
  *    remains the read-side guard, exactly like the reference's comment
  *    (`resources/firehose_transformation.py:16`).
  *
  * Scale notes: the whole pipeline is stateless map-side work — no shuffle,
  * no state store; parallelism == source file/partition parallelism. The
  * only fan-in is the dynamic partition write, bounded per batch by
  * `maxRecordsPerFile` if configured.
  */
object CdcStream {

  /** Rate-limited JSON-lines stream source (the Kinesis stand-in; SURVEY
    * §2.2 sources table — any [[graft.sources.CdcSource]] plugs in here). */
  def source(spark: SparkSession, inputPath: String,
             maxFilesPerTrigger: Option[Int] = None): DataFrame =
    graft.sources.FileCdcSource(inputPath, maxFilesPerTrigger).stream(spark)

  /** Full pipeline as a stream writer; caller starts/stops it.
    *
    * Delivery semantics (honest version): the checkpoint guarantees each
    * source batch is PROCESSED once per successful commit, but the two
    * sinks are independent non-transactional directories — if the JVM dies
    * between the lake write and the checkpoint commit, the replayed batch
    * appends the ok rows again. That residual at-least-once-ness is exactly
    * the reference's position (at-least-once transport + lake-side dedupe,
    * `firehose_transformation.py:16`): the A16 snapshot is the read-side
    * guard. The error write IS replay-idempotent: it lands under a
    * batch-id-keyed directory with overwrite.
    *
    * CROSS-ZONE contract, pinned: the zones commit INDEPENDENTLY and in
    * order (ok first, then error). A crash between the two can leave a
    * batch's ok rows visible with its error rows absent until the
    * checkpointed replay re-runs the batch and completes both — so
    * cross-zone consistency is eventual (bounded by one replay), with no
    * loss on either zone and no duplicates on the error zone. A consumer
    * that must never observe the half-committed state uses [[pipelineTx]],
    * which commits both routes in one atomic TxLog generation.
    *
    * @param ingestionTs injectable clock (None = envelope creation time,
    *   the deterministic default; pass `Some(current_timestamp())` for the
    *   reference's wall-clock behavior).
    */
  def pipeline(parsed: DataFrame, lakePath: String, errorPath: String,
               checkpoint: String,
               trigger: Trigger = Trigger.ProcessingTime("60 seconds"),
               ingestionTs: Option[org.apache.spark.sql.Column] = None): DataStreamWriter[org.apache.spark.sql.Row] =
    parsed.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist() // both sinks + the emptiness check read it once
        try {
          val (valid, errors) = Cdc.split(batch)
          val ok = Cdc.transform(valid, ingestionTs)
          Cdc.writeCdcZone(ok, lakePath)
          if (!errors.isEmpty) {
            errors
              .withColumn("raw", coalesce(col("_corrupt_record"),
                to_json(struct(col("eventName"), col("dynamodb")))))
              .select("error_reason", "raw")
              .write.mode("overwrite") // batch-keyed dir -> replay-idempotent
              .partitionBy("error_reason")
              .option("compression", "gzip")
              .json(s"$errorPath/batch_id=$batchId")
          }
        } finally batch.unpersist()
        ()
      }

  /** TRANSACTIONAL dual sink: ok rows and error rows commit in ONE
    * atomic TxLog generation per micro-batch, closing [[pipeline]]'s
    * residual window (a crash between its two independent directory
    * writes can land the ok zone without the error zone — or vice versa
    * — until the replay completes both). Here there is no window: both
    * routes ride one `exactlyOnceAppend(batchId)`, so a batch is either
    * fully visible (both routes) or not at all, and a replay is a no-op.
    *
    * Layout trade vs the reference-fidelity [[pipeline]]: instead of two
    * directories this is ONE TxLog zone with a `route` column
    * ('ok' | 'err'); the two routes are built as separate frames and
    * unioned WITHOUT a shuffle, so every data file is route-pure by
    * construction, and `route` rides in `statsCols` —
    * [[graft.operators.TxLog.readWhereCol]] (or the streaming source's
    * pushdown) then serves an ok-only or err-only read without opening
    * the other route's files. Ok payloads are serialized to the same
    * JSON lines the reference lake stores; error rows keep
    * (error_reason, raw). */
  def commitBatchTx(zone: String,
                    ingestionTs: Option[org.apache.spark.sql.Column] = None)
                   (batch: DataFrame, batchId: Long): Unit = {
    batch.persist()
    try {
      val spark = batch.sparkSession
      val (valid, errors) = Cdc.split(batch)
      val ok = Cdc.transform(valid, ingestionTs)
      val okRows = ok.select(
        lit("ok").as("route"),
        lit(null).cast("string").as("error_reason"),
        to_json(struct(ok.columns.map(col).toSeq: _*)).as("line"))
      val errRows = errors
        .withColumn("raw", coalesce(col("_corrupt_record"),
          to_json(struct(col("eventName"), col("dynamodb")))))
        .select(lit("err").as("route"), col("error_reason"), col("raw").as("line"))
      // no shuffle: union keeps each child's partitions, and each child is
      // single-route, so every written file is route-pure (tight stats)
      graft.operators.TxLog.exactlyOnceAppend(spark, zone,
        okRows.unionByName(errRows), batchId, statsCols = Seq("route"))
      ()
    } finally { batch.unpersist(); () }
  }

  /** [[pipeline]]'s shape with the transactional sink: one TxLog zone,
    * atomic cross-route commits. */
  def pipelineTx(parsed: DataFrame, zone: String, checkpoint: String,
                 trigger: Trigger = Trigger.ProcessingTime("60 seconds"),
                 ingestionTs: Option[org.apache.spark.sql.Column] = None)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    parsed.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .foreachBatch(commitBatchTx(zone, ingestionTs) _)

  /** Convenience: run the pipeline over all currently-available input then
    * stop (test/backfill mode — batch semantics, streaming machinery). */
  def runAvailableNow(spark: SparkSession, inputPath: String, lakePath: String,
                      errorPath: String, checkpoint: String): Unit = {
    val q: StreamingQuery =
      pipeline(source(spark, inputPath), lakePath, errorPath, checkpoint,
        trigger = Trigger.AvailableNow())
        .start()
    q.awaitTermination()
  }
}
