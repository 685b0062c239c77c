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
