package graft

import graft.operators.TxLog

/** Round-6 additions: the declared TxLog pruned-read query's IO shape —
  * CORRECTNESS pins its rows; this pins that those rows were produced by
  * scanning ONLY the stats-overlapping files. */
class Round6Spec extends SparkSpec {

  test("q156: the TxLog scan reads only shipdate-overlapping files") {
    val df = Queries.queryMap("q156_txlog_pruned_read")(spark, sf0001)
    val zone = Round6Queries.shipdateZone(spark, sf0001)
    val head = TxLog.latest(spark, zone).get
    val keep = TxLog.prunedFilesFor(head, "l_shipdate", "1996-01-01 00:00:00", "1996-03-31 23:59:59")
    assert(df.inputFiles.length === keep.size,
      s"scan touched ${df.inputFiles.length} files, pruned list has ${keep.size}")
    assert(keep.size < head.files.size,
      s"no skipping happened: ${keep.size} of ${head.files.size} files")
    assert(df.count() > 0, "the pruned read returned no rows")
    // every returned row actually satisfies the predicate (pruning is an
    // optimization, never a filter substitute)
    import org.apache.spark.sql.functions.col
    assert(df.filter(col("l_shipdate").cast("string") < "1996-01-01 00:00:00" ||
      col("l_shipdate").cast("string") > "1996-03-31 23:59:59").count() === 0L)
  }
}
