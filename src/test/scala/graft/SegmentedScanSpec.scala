package graft

import graft.operators.FullLoad
import graft.sources.{SegmentedScan, SyntheticSegmentedScan}

/** The pluggable segmented-scan boundary (the reference's parallel
  * DynamoDB scan, ddb_full_load.py:56-65): one task per segment, every
  * row exactly once regardless of the segment count, and the full-load
  * pipeline runs end-to-end from the connector. */
class SegmentedScanSpec extends SparkSpec {

  private val source = SyntheticSegmentedScan(totalRows = 1000L)

  test("exactly one task per segment; segments are a disjoint cover") {
    for (n <- Seq(1, 3, 8)) {
      val df = SegmentedScan.toDataFrame(spark, source, n)
      assert(df.rdd.getNumPartitions === n, s"expected $n scan tasks")
      val ids = df.select("id").collect().map(_.getLong(0))
      assert(ids.length === 1000 && ids.toSet.size === 1000,
        s"segments with totalSegments=$n lost or duplicated rows")
    }
  }

  test("full load from the connector: splitCount tasks -> columnar zone") {
    val dest = java.nio.file.Files.createTempDirectory("segload").toString + "/out"
    val splits = FullLoad.splitCount("G.1X", numWorkers = 2) // 8
    FullLoad.runScan(spark, source, splits, dest, outputPartitions = 4)
    val back = FullLoad.readBack(spark, dest)
    assert(back.count() === 1000L)
    assert(back.columns.toSeq === Seq("id", "payload"))
    // A4: the output file count is the explicit repartition, not the
    // scan topology
    val files = new java.io.File(dest).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files === 4, s"expected 4 output files, got $files")
  }
}
