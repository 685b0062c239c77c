package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction for lake zones.
  *
  * The reference's CDC zone is built from Firehose micro-batch flushes —
  * observed objects of 365 B–1.4 KB (`images/ddb cdc result.png`,
  * README.md:58-59). At 100 TB that layout is the classic small-files
  * problem: listing dominates planning, each task reads one tiny object,
  * and the NameNode/S3 metadata load grows unbounded. Compaction rewrites
  * a zone into ~`targetBytes` files while preserving data, schema, and
  * partition layout.
  *
  * Scale shape: ONE round-robin shuffle sized from the zone's actual byte
  * weight (not row count — rows vary wildly in width), then an
  * atomic-enough swap (write `<path>__compact_tmp`, delete old, rename).
  * On object stores the rename is a copy; production orchestration runs
  * this per PARTITION directory (hour dirs in the CDC zone) so the unit of
  * rewrite stays bounded and concurrent readers of other partitions are
  * untouched.
  */
object Compaction {

  final case class Stats(filesBefore: Long, filesAfter: Long,
                         bytesBefore: Long, rows: Long)

  /** List the zone's data files (skips _SUCCESS/metadata/hidden). */
  private def dataFiles(spark: SparkSession, path: String): Seq[org.apache.hadoop.fs.FileStatus] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) buf += f
      }
      buf.toSeq
    }
  }

  /** Compact `path` (a lake zone dir) into ~`targetBytes` files per
    * partition-set, preserving `partitionCols` directory layout. Returns
    * before/after stats. No-op (returns stats unchanged) when the zone
    * already meets the target file count. */
  def compact(spark: SparkSession, path: String, format: String = "parquet",
              targetBytes: Long = 128L << 20,
              partitionCols: Seq[String] = Nil): Stats = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val before = dataFiles(spark, path)
    val bytes = before.map(_.getLen).sum
    val wantFiles = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong)
    if (before.isEmpty || before.size <= wantFiles)
      return Stats(before.size.toLong, before.size.toLong, bytes, -1L)

    val df = spark.read.format(format).load(path)
    val rows = df.count()
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    val writer = df.repartition(wantFiles.toInt)
      .write.mode(SaveMode.Overwrite).format(format)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .save(tmp)

    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    require(fs.rename(new Path(tmp), p),
      s"compaction swap failed: $tmp -> $path (zone left intact at $tmp)")
    Stats(before.size.toLong, dataFiles(spark, path).size.toLong, bytes, rows)
  }

  /** Compact only the partitions of a partitioned zone selected by
    * `partitionPredicate` (e.g. "year=2024/month=01"): the bounded-unit
    * production form — concurrent readers of other partitions never see a
    * swap. */
  def compactPartition(spark: SparkSession, zonePath: String, partitionSubdir: String,
                       format: String = "parquet", targetBytes: Long = 128L << 20): Stats =
    compact(spark, zonePath.stripSuffix("/") + "/" + partitionSubdir, format, targetBytes)

  /** Compact every CLOSED hour partition of an A13-layout CDC zone
    * (`year=Y/month=M/day=D/hour=H`, the reference's Firehose prefix as
    * written by Cdc.writeCdcZone): an hour is closed when it sorts
    * strictly before `beforeHour` = (year, month, day, hour) — typically
    * the hour currently being written. The streaming writer only ever
    * APPENDS to the current processing-time hour, so closed hours are
    * immutable and compacting them never races the writer; the current
    * hour is deliberately left alone. Returns per-hour stats of the
    * partitions actually rewritten. */
  def compactClosedHours(spark: SparkSession, zonePath: String,
                         beforeHour: (Int, Int, Int, Int),
                         format: String = "json",
                         targetBytes: Long = 128L << 20): Seq[(String, Stats)] = {
    val root = new Path(zonePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    def subdirs(p: Path, prefix: String): Seq[(Int, Path)] =
      fs.listStatus(p).toSeq.filter(_.isDirectory)
        .flatMap { s =>
          val n = s.getPath.getName
          if (n.startsWith(prefix + "=")) Some(n.stripPrefix(prefix + "=").toInt -> s.getPath)
          else None
        }
    val closed = for {
      (y, yp) <- subdirs(root, "year")
      (m, mp) <- subdirs(yp, "month")
      (d, dp) <- subdirs(mp, "day")
      (h, _) <- subdirs(dp, "hour")
      if Ordering[(Int, Int, Int, Int)].lt((y, m, d, h), beforeHour)
    } yield ((y, m, d, h), s"year=$y/month=$m/day=$d/hour=$h")
    // chronological (numeric) order — lexicographic would put hour=10
    // before hour=9
    closed.sortBy(_._1).map { case (_, sub) =>
      sub -> compactPartition(spark, zonePath, sub, format, targetBytes)
    }
  }
}
