package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Pluggable segmented table scan — the batch-side twin of [[CdcSource]].
  *
  * The reference full-load job scans DynamoDB in `totalSegments` parallel
  * ranges (`lib/glue_jobs/ddb_full_load.py:56-65`, each Glue task calling
  * `Scan(Segment=i, TotalSegments=n)`). The network client cannot exist
  * in this zero-egress environment, so the engine ships the BOUNDARY: a
  * connector implements one method — "give me segment i of n" — and
  * [[SegmentedScan.toDataFrame]] owns the distributed shape (exactly one
  * task per segment, schema contract, no driver-side row buffering). A
  * real DynamoDB/Cassandra/HBase client is a drop-in implementation, not
  * an operator edit.
  *
  * Implementations are serialized into task closures: hold the client in
  * a `@transient lazy val` so it is constructed once per executor JVM and
  * never shipped over the wire (the same discipline as
  * [[graft.operators.Multimodal.MediaCodec]]).
  */
trait SegmentedScan extends Serializable {
  /** Schema of every produced row. */
  def schema: StructType
  /** Rows of segment `segment` (0-based) of `totalSegments`. Called on
    * EXECUTORS, one invocation per segment; must be usable from any
    * segment/total combination (the connector hashes or range-splits its
    * key space accordingly). */
  def scanSegment(segment: Int, totalSegments: Int): Iterator[Row]
}

object SegmentedScan {

  /** Materialize a segmented source as a DataFrame with EXACTLY one task
    * per segment — the reference's scan parallelism (A1/A2), expressed as
    * partition topology instead of a worker fleet. `spark.range(n)` with
    * `numPartitions = n` puts one segment id in each partition; the
    * flatMap streams the connector's iterator straight into the task's
    * output, so a segment never collects on the driver and a slow
    * segment only stalls its own task. */
  def toDataFrame(spark: SparkSession, source: SegmentedScan,
                  totalSegments: Int): DataFrame = {
    require(totalSegments >= 1, s"totalSegments must be >= 1, got $totalSegments")
    val enc = org.apache.spark.sql.Encoders.row(source.schema)
    spark.range(0L, totalSegments.toLong, 1L, numPartitions = totalSegments)
      .flatMap(seg => source.scanSegment(seg.toInt, totalSegments))(enc)
      .toDF()
  }
}

/** Stand-in connector: a deterministic synthetic key-value table,
  * hash-partitioned across segments — behaviorally the shape of a
  * DynamoDB parallel scan (disjoint covering segments, any per-segment
  * order, no Spark on the connector side). The test double proving the
  * trait's contract without a network; a real client replaces the id
  * loop with paginated Scan(Segment=i, TotalSegments=n) calls. */
final case class SyntheticSegmentedScan(totalRows: Long) extends SegmentedScan {
  override val schema: StructType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("payload",
      org.apache.spark.sql.types.StringType, nullable = false)))
  override def scanSegment(segment: Int, totalSegments: Int): Iterator[Row] =
    // generate the stripe directly (ids ≡ segment mod totalSegments):
    // O(rows/segments) per task, not an O(totalRows) scan-and-filter in
    // EVERY segment — the difference between O(n) and O(n·segments)
    // total work in the scale runs this test double drives
    (segment.toLong until totalRows by totalSegments.toLong).iterator
      .map(id => Row(id, s"p$id"))
}
