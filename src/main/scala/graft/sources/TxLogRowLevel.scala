package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.execution.datasources.OutputWriter
import org.apache.spark.sql.graft.FileSourceBridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import graft.operators.TxLog

/** SQL `UPDATE` / `MERGE INTO` / rewrite-`DELETE` on txlog zones —
  * Spark's GROUP-BASED row-level operations (the copy-on-write model
  * Delta/Iceberg ship), completing the DML surface the catalog opened.
  * The framework's contract, and how the pieces here meet it:
  *
  *  - Spark rewrites the statement into `ReplaceData(query)` where the
  *    query computes the FULL replacement content of every "group" the
  *    operation's scan serves (updated/merged rows + the served files'
  *    untouched rows). Our group is a data FILE; the scan is the same
  *    [[TxLogBatchScan]] the batch table plans, with a
  *    [[TxLogFileRecorder]] noting exactly which files it served.
  *  - GROUP PRUNING is runtime-only, deliberately: Spark's
  *    RowLevelOperationRuntimeGroupFiltering feeds the scan an IN over
  *    the MATCHING rows' stats-tracked columns (safe direction — a
  *    pruned file provably holds no matching row and keeps all its rows
  *    by staying out of the rewrite). Static pushed filters are NOT
  *    offered by this scan builder: a delete condition arrives as its
  *    survivor complement (`DELETE WHERE k != 5` pushes `k = 5`), and
  *    file-pruning by THAT drops exactly the all-matching files whose
  *    rows must go — the one direction that silently un-deletes. At 100
  *    TB the runtime path is also the one that matters: the touched-key
  *    set is unknowable at plan time.
  *  - The WRITE is a real v2 [[BatchWrite]]: executors stream the
  *    replacement rows through Spark's own parquet/orc writer
  *    ([[FileSourceBridge.writeFactory]]) into a staged `d-<uuid>/`
  *    dir; the driver's commit removes orphaned attempt files (task
  *    retries), then publishes remove(served files) + add(staged files)
  *    as ONE generation via [[TxLog.commitRewrite]] — O(touched files)
  *    amplification, stats collected for the new files.
  *  - Concurrency: the statement pins the table's load-time snapshot;
  *    a rival commit mid-statement aborts the publish loudly
  *    ([[TxLog.SnapshotMovedException]]) instead of last-writer-wins —
  *    replacement rows computed from a stale read must never overwrite
  *    a newer head (the lost-update anomaly).
  *
  * Translatable `DELETE`s never reach this path: Spark's
  * OptimizeMetadataOnlyDeleteFromTable converts them back to
  * [[TxLogTable.deleteWhere]]'s cheaper stats-pruned form; this rewrite
  * serves the predicates that CANNOT be pushed (`k % 2 = 0`, UDF-shaped
  * conditions) plus every UPDATE and MERGE. */
final class TxLogRowLevelOperation(spark: SparkSession, zone: String,
                                   snap: TxLog.Snapshot, schema: StructType,
                                   cmd: Command) extends RowLevelOperation {

  private[sources] val recorder = new TxLogFileRecorder

  override def command(): Command = cmd

  override def description(): String =
    s"txlog ${cmd.toString.toLowerCase(java.util.Locale.ROOT)} [$zone gen ${snap.gen}]"

  /** A minimal builder: full schema, NO static pushdown (see class doc);
    * runtime group filtering rides [[TxLogBatchScan]]'s
    * SupportsRuntimeV2Filtering. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan =
        TxLogBatchScan(spark, zone, snap, schema, schema,
          Array.empty, None, Some(recorder))
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = {
          // replacement files must carry PHYSICAL column names (rows are
          // positional; only the parquet footer names change) so one read
          // schema keeps serving touched and untouched files alike
          val cmap = TxLog.colMap(snap.meta)
          val physSchema =
            if (cmap.isEmpty) info.schema()
            else StructType(info.schema().fields.map(f =>
              f.copy(name = cmap.getOrElse(f.name, f.name))))
          new TxLogRewriteBatchWrite(spark, zone, snap.gen, recorder,
            physSchema, snap.format,
            cmd.toString.toLowerCase(java.util.Locale.ROOT))
        }
        override def description(): String =
          TxLogRowLevelOperation.this.description()
      }
    }
}

/** Which files the row-level scan served — the exact set the commit
  * removes. Last plan wins: Spark re-plans partitions after runtime
  * group filters arrive, and execution uses that final set. */
final class TxLogFileRecorder extends Serializable {
  @volatile private var served: Set[String] = Set.empty
  def record(keep: Seq[String]): Unit = served = keep.toSet
  def files: Set[String] = served
}

final class TxLogRewriteBatchWrite(spark: SparkSession, zone: String,
                                   expectedGen: Long,
                                   recorder: TxLogFileRecorder,
                                   schema: StructType, format: String,
                                   op: String) extends BatchWrite {

  private val dataDirName = "d-" + UUID.randomUUID().toString.take(8)
  private def dataDirPath = new Path(zone.stripSuffix("/"), dataDirName)
  private def fs = dataDirPath.getFileSystem(spark.sessionState.newHadoopConf())

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val (factory, conf) = FileSourceBridge.writeFactory(spark, format, schema)
    val dir = fs.makeQualified(dataDirPath).toString
    // group-based ReplaceData rows arrive as (__row_operation, data...):
    // with no metadata projection Spark's plain writing task hands the
    // operation column through, so the writer strips leading field 0
    new TxLogZoneWriterFactory(factory, conf, schema, dir,
      stripOperationColumn = true)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val committed = messages.collect {
      case TxLogFileCommit(Some(name)) => name }.toSet
    // drop attempt orphans (a retried task's first file) BEFORE stats
    // collection reads the staged dir; the commit additionally adopts
    // ONLY the committed writers' reported names — a zombie task
    // landing its file between the sweep and the publish stays
    // unreferenced (vacuum reclaims it)
    val dir = fs.makeQualified(dataDirPath)
    if (fs.exists(dir)) {
      fs.listStatus(dir).map(_.getPath)
        .filterNot(p => committed(p.getName))
        .foreach(fs.delete(_, false))
    }
    TxLog.commitRewrite(spark, zone, expectedGen,
      removed = recorder.files.toSeq, dataDir = dir.toString, op = op,
      onlyFiles = Some(committed.map(n => s"$dataDirName/$n"))): Unit
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    fs.delete(fs.makeQualified(dataDirPath), true): Unit
  }
}

/** `name` is the written file's base name inside the staged dir; None
  * when the writer saw no rows (no empty files in the generation). */
final case class TxLogFileCommit(name: Option[String]) extends WriterCommitMessage

final class TxLogZoneWriterFactory(
    factory: org.apache.spark.sql.execution.datasources.OutputWriterFactory,
    conf: SerializableConfiguration, schema: StructType, dataDir: String,
    stripOperationColumn: Boolean = false)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var writer: OutputWriter = null
      private var name: Option[String] = None
      // data columns sit at 1..n behind the operation int (field 0)
      private val strip =
        if (stripOperationColumn)
          Some(org.apache.spark.sql.catalyst.ProjectingInternalRow(
            schema, (1 to schema.length).toList))
        else None

      // lazy: a partition with zero replacement rows writes no file
      private def ensure(): OutputWriter = {
        if (writer == null) {
          val ctx = FileSourceBridge.taskAttemptContext(conf, partitionId, taskId)
          val base = f"part-$partitionId%05d-$taskId${factory.getFileExtension(ctx)}"
          name = Some(base)
          writer = factory.newInstance(s"$dataDir/$base", schema, ctx)
        }
        writer
      }

      override def write(row: InternalRow): Unit = strip match {
        case Some(p) => p.project(row); ensure().write(p)
        case None    => ensure().write(row)
      }

      override def commit(): WriterCommitMessage = {
        if (writer != null) { writer.close(); writer = null }
        TxLogFileCommit(name)
      }

      override def abort(): Unit = {
        if (writer != null) { writer.close(); writer = null }
        name.foreach { n =>
          val p = new Path(s"$dataDir/$n")
          p.getFileSystem(conf.value).delete(p, false): Unit
        }
      }

      override def close(): Unit =
        if (writer != null) { writer.close(); writer = null }
    }
}