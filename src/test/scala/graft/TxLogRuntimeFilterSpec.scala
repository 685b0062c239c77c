package graft

import org.apache.spark.sql.functions._
import graft.operators.TxLog
import graft.plans.PushdownProbe

/** Runtime (join-driven) file pruning on the txlog batch table
  * ([[graft.sources.TxLogBatchScan]]'s SupportsRuntimeV2Filtering): in a
  * star join `fact JOIN dim ON fact.k = dim.k WHERE dim.<selective>`,
  * the dim's ACTUAL keys — unknowable at plan time — must prune the
  * fact zone's file list against the committed k-stats before any fact
  * file is opened, with rows identical to the unpruned join. */
class TxLogRuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def freshZone(): String =
    java.nio.file.Files.createTempDirectory("graft_rtf").toString + "/zone"

  /** 8 range-partitioned files over k ∈ [0, 800) with tight k stats. */
  private def factZone(): String = {
    val zone = freshZone()
    TxLog.replace(spark, zone,
      spark.range(800L).toDF("k").repartitionByRange(8, col("k")),
      statsCols = Seq("k"))
    zone
  }

  private def load(zone: String) =
    spark.read.format("txlog").option("zone", zone).load()

  /** A dim the optimizer cannot constant-fold (DPP requires a real
    * selective Filter on the broadcast side; an in-memory literal frame
    * folds to nothing). */
  private def parquetDim(rows: org.apache.spark.sql.DataFrame) = {
    val p = java.nio.file.Files.createTempDirectory("graft_rtf_dim").toString
    rows.write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  test("a filtered dim's join keys prune the fact zone's files at run time") {
    val zone = factZone()
    // dim: region 'x' keys live only in the first file's k-range
    val dim = parquetDim(
      spark.range(40L).selectExpr("id AS dk", "'x' AS region")
        .union(spark.range(400L, 440L).selectExpr("id AS dk", "'y' AS region")))
    PushdownProbe.clear(s"txlog:$zone")
    val j = load(zone)
      .join(broadcast(dim.filter(col("region") === "x")), col("k") === col("dk"))
      .select("k")
    val got = j.as[Long].collect().toSet
    assert(got === (0L until 40L).toSet, "join rows must be exact")
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(total === 8L, s"fixture must commit 8 files, got $total")
    assert(served < total,
      s"the dim's runtime keys must file-prune the fact scan: $served/$total")
    // the planner wired a dynamic-pruning subquery into the scan's
    // runtime filters (the executed form delivers it as an IN over the
    // dim's keys — the file pruning asserted above)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [dynamicpruningexpression"),
      s"the scan must carry the dynamic-pruning filter:\n${plan.take(1500)}")
  }

  test("runtime + static filters compose; rows equal the unpruned join") {
    val zone = factZone()
    val dim = parquetDim(
      spark.range(30L).selectExpr("id * 20 AS dk", "'x' AS region"))
    val expect = TxLog.read(spark, zone).filter(col("k") < 300L)
      .join(dim.filter(col("region") === "x"), col("k") === col("dk"))
      .select("k").as[Long].collect().toSet
    PushdownProbe.clear(s"txlog:$zone")
    val got = load(zone).filter(col("k") < 300L)
      .join(broadcast(dim.filter(col("region") === "x")), col("k") === col("dk"))
      .select("k").as[Long].collect().toSet
    assert(got === expect)
    val (served, total) = PushdownProbe.get(s"txlog:$zone").get
    assert(served < total,
      s"static k<300 pruning must still hold under the join: $served/$total")
  }

  test("an untracked join key declines runtime filtering but stays correct") {
    val zone = freshZone()
    TxLog.replace(spark, zone,
      spark.range(100L).selectExpr("id AS k", "id AS u")
        .repartitionByRange(4, col("k")),
      statsCols = Seq("k")) // u untracked: nothing to prune by
    val dim = spark.range(10L).selectExpr("id AS du")
    val got = load(zone)
      .join(broadcast(dim), col("u") === col("du"))
      .select("u").as[Long].collect().toSet
    assert(got === (0L until 10L).toSet,
      "declined runtime filtering must not change results")
  }
}
