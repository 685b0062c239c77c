package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Cdc

/** Pluggable CDC stream source (SURVEY §2.2 sources table).
  *
  * The reference ingests from a Kinesis Data Stream (10 shards,
  * `lib/dynamodb-streaming-datalake-stack.ts:59-64`); in this zero-egress
  * environment the file source stands in, and a production deployment
  * implements this trait against the Kinesis (or any queue) connector —
  * the rest of the pipeline ([[graft.streaming.CdcStream.pipeline]])
  * consumes only the parsed-envelope DataFrame contract and never knows
  * the transport.
  */
trait CdcSource {
  /** Unbounded parsed-envelope frame (schema = [[Cdc.envelopeSchema]]). */
  def stream(spark: SparkSession): DataFrame
}

/** JSON-lines files under a directory; `maxFilesPerTrigger` is the rate
  * limit standing in for Kinesis shard read throughput (A11). */
final case class FileCdcSource(path: String, maxFilesPerTrigger: Option[Int] = None)
    extends CdcSource {
  override def stream(spark: SparkSession): DataFrame = {
    val reader = spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger.getOrElse(Int.MaxValue))
    Cdc.parse(reader.text(path), "value")
  }
}

/** In-memory source for tests: caller owns the MemoryStream and passes its
  * raw JSON-line frame here for parsing. */
final case class RawFrameCdcSource(raw: DataFrame, jsonCol: String = "value")
    extends CdcSource {
  override def stream(spark: SparkSession): DataFrame = Cdc.parse(raw, jsonCol)
}
