package graft.sources

import org.apache.spark.internal.Logging
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
import org.apache.spark.sql.graft.{PlanBridge, StreamBridge}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Cdc
import graft.plans.{PrunableScan, PushdownProbe}

/** Structured Streaming source over a [[ShardStore]] — the emulated
  * Kinesis transport the reference ingests from (`lib/dynamodb-streaming-
  * datalake-stack.ts:59-64,199-203`), with the transport's REAL
  * semantics wired through, not a file glob:
  *
  *  - The streaming Offset is the per-shard cursor map (shardId -> last
  *    consumed sequence number), serialized as canonical sorted JSON —
  *    restart resumes every shard exactly where the last COMMITTED batch
  *    left it (checkpointed resume, the Kinesis consumer contract).
  *  - Each batch serves, per shard, the records in (cursor, head] in
  *    sequence order. Ordering is PER SHARD ONLY: the batch frame carries
  *    (shard, seq) so a downstream that needs per-key order uses the
  *    shard routing guarantee (one key, one shard), never a global
  *    arrival order the transport does not promise.
  *  - Resharding is discovered at offset time: new child shards simply
  *    appear in the cursor map at 0. A closed parent's records all
  *    precede every child record (puts stop at split/merge), so reading
  *    parents and children to head in the same batch preserves per-key
  *    order across the reshard boundary.
  *  - Record bodies are read on EXECUTORS (the per-shard (from, to] spec
  *    is what ships, one task per shard) — the driver holds cursors,
  *    never data, exactly the shape a real consumer library has.
  *
  * Usage: `spark.readStream.format("shardstore").option("dir", path)
  * .load()` → rows (shard STRING, seq LONG, value STRING). */
class ShardStreamProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "shardstore"

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (s"shardstore[${parameters.getOrElse("dir", "?")}]", ShardStreamSource.schema)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    val dir = parameters.getOrElse("dir",
      throw new IllegalArgumentException(
        "shardstore source requires option 'dir' (the shard store path)"))
    new ShardStreamSource(sqlContext, dir,
      parameters.get("maxRecordsPerShard").map(_.toLong))
  }
}

object ShardStreamSource {
  val schema: StructType = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Canonical offset JSON: shard ids sorted, `{"s0":12,"s1":7}`. Shard
    * ids are [A-Za-z0-9.-] by construction, so the grammar needs no
    * escaping and the parse below is total on what serialize emits. */
  private[graft] def serialize(cursors: Map[String, Long]): String =
    cursors.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  private[graft] def parse(json: String): Map[String, Long] = {
    val body = json.trim.stripPrefix("{").stripSuffix("}").trim
    if (body.isEmpty) Map.empty
    else body.split(",").map { kv =>
      val i = kv.lastIndexOf(':')
      kv.substring(0, i).trim.stripPrefix("\"").stripSuffix("\"") ->
        kv.substring(i + 1).trim.toLong
    }.toMap
  }
}

final case class ShardOffset(cursors: Map[String, Long]) extends Offset {
  override def json: String = ShardStreamSource.serialize(cursors)
}

class ShardStreamSource(sqlContext: SQLContext, dir: String,
                        maxRecordsPerShard: Option[Long] = None)
    extends Source with Logging {

  require(maxRecordsPerShard.forall(_ >= 1L),
    s"maxRecordsPerShard must be >= 1, got $maxRecordsPerShard")

  private val spark = sqlContext.sparkSession
  override val schema: StructType = ShardStreamSource.schema

  private def store = new ShardStore(dir)

  /** Cursors of the last batch this source OFFERED — the backpressure
    * anchor for `maxRecordsPerShard` (the GetRecords page-size limit a
    * real consumer lives under: a consumer behind a deep shard drains
    * it in bounded bites, per shard, instead of one giant batch).
    * Unknown until the first getBatch of a run, and the first offer
    * after a (re)start is UNCAPPED: capping from zero could offer an
    * offset BELOW a checkpoint-committed cursor (offset regression) —
    * the same best-effort contract as maxFilesPerTrigger. */
  private var lastEnd: Option[Map[String, Long]] = None

  private def cursorsOf(o: Offset): Map[String, Long] = o match {
    case ShardOffset(c) => c
    case s: SerializedOffset => ShardStreamSource.parse(s.json)
    case other => sys.error(s"shardstore source: unexpected offset type $other")
  }

  override def getOffset: Option[Offset] = {
    val st = store
    val heads = st.shards().map { s =>
      val h = st.maxSeq(s.id)
      s.id -> ((maxRecordsPerShard, lastEnd) match {
        case (Some(m), Some(base)) => math.min(h, base.getOrElse(s.id, 0L) + m)
        case _ => h
      })
    }.toMap
    if (heads.values.forall(_ == 0L)) None else Some(ShardOffset(heads))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(cursorsOf).getOrElse(Map.empty)
    val to = cursorsOf(end)
    lastEnd = Some(to)
    // one (shard, from, to] spec per shard with news; executors read the
    // record files — the driver never materializes a record body. The
    // batch is a GraftScan leaf so the session extension can fold the
    // query's shard/seq predicates into the spec list (serve only
    // matching shards) — see graft.plans.PushFiltersIntoGraftScan.
    val specs = to.toSeq.sorted.flatMap { case (shard, hi) =>
      val lo = from.getOrElse(shard, 0L)
      if (hi > lo) Some((shard, lo, hi)) else None
    }
    val scan = ShardPrunableScan(spark, dir, specs)
    if (graft.plans.GraftScanStrategy.registeredIn(spark))
      PlanBridge.dataFrame(spark,
        graft.plans.GraftScan(DataTypeUtils.toAttributes(schema), scan))
    else
      // vanilla session without GraftExtensions: the leaf would be
      // unplannable — serve the same batch unpruned via the bridge
      StreamBridge.streamingDataFrame(spark, scan.buildRDD(Nil), schema)
  }

  override def stop(): Unit = ()

  override def toString: String = s"ShardStreamSource[$dir]"
}

/** The shard batch as a [[PrunableScan]]: a query-plan predicate on
  * `shard` prunes whole shard specs before any record file is opened,
  * and `seq` bounds tighten each spec's (lo, hi] window — the Kinesis
  * consumer shape where a reader of one shard's slice never touches the
  * other nine shards' data. Every record the RDD produces is still
  * filtered by the full original predicate above (superset contract),
  * so an unsupported or partially-supported filter only costs skipped
  * pruning, never correctness. */
final case class ShardPrunableScan(spark: SparkSession, dir: String,
                                   specs: Seq[(String, Long, Long)],
                                   cap: Option[Int] = None)
    extends PrunableScan {

  override def describe: String = s"shardstore[$dir]"

  /** Trim the spec list to the first `n` records (windows are dense, so
    * (hi - lo) IS the record count): a `.limit(5)` preview reads 5
    * records from the first live shard, never the firehose. */
  override def withLimit(n: Int): Option[PrunableScan] =
    Some(copy(cap = Some(cap.fold(n)(math.min(_, n)))))

  private def limitSpecs(in: Seq[(String, Long, Long)], n: Int)
      : Seq[(String, Long, Long)] = {
    var remaining = n.toLong
    val out = Seq.newBuilder[(String, Long, Long)]
    val it = in.iterator
    while (it.hasNext && remaining > 0L) {
      val (sh, lo, hi) = it.next()
      val take = math.min(hi - lo, remaining)
      out += ((sh, lo, lo + take))
      remaining -= take
    }
    out.result()
  }

  override def accepts(f: sources.Filter): Boolean = f match {
    case sources.EqualTo("shard", _: String)            => true
    case sources.In("shard", vs)                        => vs.forall(_.isInstanceOf[String])
    case sources.EqualTo("seq", _: Long)                => true
    case sources.GreaterThan("seq", _: Long)            => true
    case sources.GreaterThanOrEqual("seq", _: Long)     => true
    case sources.LessThan("seq", _: Long)               => true
    case sources.LessThanOrEqual("seq", _: Long)        => true
    case _                                              => false
  }

  /** Conjunctive narrowing of the spec list; windows stay (lo, hi]. */
  private def prune(pushed: Seq[sources.Filter]): Seq[(String, Long, Long)] = {
    var keep = specs
    pushed.foreach {
      case sources.EqualTo("shard", v: String) => keep = keep.filter(_._1 == v)
      case sources.In("shard", vs) =>
        val s = vs.collect { case x: String => x }.toSet
        keep = keep.filter(t => s(t._1))
      case sources.EqualTo("seq", v: Long) =>
        keep = keep.map { case (sh, lo, hi) => (sh, math.max(lo, v - 1), math.min(hi, v)) }
      case sources.GreaterThan("seq", v: Long) =>
        keep = keep.map { case (sh, lo, hi) => (sh, math.max(lo, v), hi) }
      case sources.GreaterThanOrEqual("seq", v: Long) =>
        keep = keep.map { case (sh, lo, hi) => (sh, math.max(lo, v - 1), hi) }
      case sources.LessThan("seq", v: Long) =>
        keep = keep.map { case (sh, lo, hi) => (sh, lo, math.min(hi, v - 1)) }
      case sources.LessThanOrEqual("seq", v: Long) =>
        keep = keep.map { case (sh, lo, hi) => (sh, lo, math.min(hi, v)) }
      case _ => ()
    }
    keep.filter { case (_, lo, hi) => hi > lo }
  }

  override def buildRDD(pushed: Seq[sources.Filter],
                        onPrune: (Long, Long) => Unit): RDD[InternalRow] = {
    // the cap composes only with an UNFILTERED scan (the rule guarantees
    // it: a Limit never sits below a Filter) — filtered windows would
    // discard rows the at-least-n contract still owes
    val served0 = prune(pushed)
    val served = cap.filter(_ => pushed.isEmpty)
      .fold(served0)(limitSpecs(served0, _))
    // sequence windows are dense, so (hi - lo) IS the record count
    onPrune(served.map(t => t._3 - t._2).sum, specs.map(t => t._3 - t._2).sum)
    PushdownProbe.record(s"shardstore:$dir",
      served.map(t => t._3 - t._2).sum, specs.map(t => t._3 - t._2).sum)
    val d = dir
    if (served.isEmpty) spark.sparkContext.emptyRDD[InternalRow]
    else spark.sparkContext.parallelize(served, served.size).mapPartitions { it =>
      val proj = UnsafeProjection.create(
        Array[DataType](StringType, LongType, StringType))
      it.flatMap { case (shard, lo, hi) =>
        val sh = UTF8String.fromString(shard)
        new ShardStore(d).get(shard, lo, hi).iterator.map { case (seq, value) =>
          proj(InternalRow(sh, seq, UTF8String.fromString(value)))
        }
      }
    }
  }
}

/** [[CdcSource]] member over the emulated shard transport: the parsed-
  * envelope contract the CDC pipeline consumes, now carried by a
  * transport with real shard semantics instead of a file glob — closing
  * the reference boundary `stack.ts:59-64` (Kinesis) the way
  * [[SegmentedScan]] closes `ddb_full_load.py:56-65` (DynamoDB scan). */
final case class ShardCdcSource(dir: String) extends CdcSource {
  override def stream(spark: SparkSession): DataFrame =
    Cdc.parse(
      spark.readStream.format("shardstore").option("dir", dir).load()
        .select("value"),
      "value")
}
