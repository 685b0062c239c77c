package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located-join lever for repeated big
  * joins at 100 TB (SURVEY §4 / builder brief: "bucketing for co-located
  * joins").
  *
  * Writing both sides of a hot join bucketed by the join key (same bucket
  * count) lets every subsequent join run with ZERO exchanges: each task
  * reads matching bucket files from both tables. The shuffle is paid once
  * at write time instead of once per query — the right trade for fact
  * tables joined daily. Requires a catalog table (`saveAsTable`), not a
  * bare path: bucket metadata lives in the catalog.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) catalog table.
    *
    * Overwrite is made robust against the in-memory catalog's amnesia: a
    * previous session may have left the managed location on disk while the
    * restarted catalog no longer knows the table, and `saveAsTable` then
    * fails with LOCATION_ALREADY_EXISTS — so any orphaned location is
    * removed first (found the hard way re-running a bucketing job in a
    * fresh session). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val ws = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    ws.saveAsTable(table)
  }

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
