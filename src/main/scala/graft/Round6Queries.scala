package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.operators.TxLog
import graft.sources.Tables

/** Round-6 inventory extension: the transaction-log read path under the
  * hash gate. q156 reads lineitem THROUGH a TxLog zone with typed per-file
  * stats and a date-range predicate, so manifest-based file skipping (the
  * 100 TB difference between scanning 3 files and 800k) is pinned by the
  * same rows+schema+hash oracle as every other operator, not just by unit
  * tests. Reference anchor: the reference lake writes raw hour prefixes
  * with no stats/skipping at all (`lib/dynamodb-streaming-datalake-stack
  * .ts:199-203`), so every reader scans the full zone; this is the
  * engine's answer. */
object Round6Queries {

  /** One TxLog zone per (JVM, sf dir): lineitem clustered by l_shipdate
    * (range partitioning = what turns per-file min/max into a sharp
    * pruning predicate) and committed with typed stats. Built once per
    * process so a bench's timed pass measures the pruned READ, while
    * every fresh JVM (each Verify run) rebuilds from the source parquet —
    * no stale state can leak across driver rounds. */
  private val zones = scala.collection.concurrent.TrieMap.empty[String, String]

  private[graft] def shipdateZone(s: SparkSession, d: String): String =
    zones.getOrElseUpdate(d, {
      val san = d.replaceAll("[^A-Za-z0-9.]", "_")
      val zone = java.nio.file.Files
        .createTempDirectory(s"graft_q156_$san").toString + "/zone"
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_shipdate"))
      TxLog.replace(s, zone,
        li.repartitionByRange(8, col("l_shipdate")),
        statsCols = Seq("l_shipdate"))
      zone
    })

  def all: Seq[Q] = Seq(

    Q("q156_txlog_pruned_read",
      // the oracle reads the SAME rows straight from the source table —
      // equality proves the zone build + manifest pruning lost nothing
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <= TIMESTAMP '1996-03-31 23:59:59'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => TxLog
        .readWhereCol(s, shipdateZone(s, d), "l_shipdate",
          "1996-01-01 00:00:00", "1996-03-31 23:59:59")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_shipdate"))
        .orderBy("l_orderkey", "l_linenumber"))
  )
}
