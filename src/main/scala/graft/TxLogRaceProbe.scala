package graft

import org.apache.spark.sql.SparkSession

/** Second-JVM writer for the cross-process TxLog OCC race spec: appends
  * `n` one-row generations to `zone`, each tagged with this writer's
  * name, relying ONLY on the log's create-exclusive generation claim to
  * serialize against whatever other process is appending to the same
  * zone at the same time. [[graft.operators.TxLog]]'s claim is
  * `FileSystem.create(path, overwrite = false)` — atomic on the same
  * local FS across PROCESSES, not just threads, which is exactly the
  * half a same-JVM spec cannot prove (two drivers on one warehouse is
  * the deployment shape that hits it: a real lake's writers are separate
  * Spark applications, never threads of one JVM).
  *
  * Usage: `TxLogRaceProbe <zone> <writerTag> <nAppends>`; prints
  * `race-probe done <tag> <n>` on success — the spec greps for it. */
object TxLogRaceProbe {
  def main(args: Array[String]): Unit = {
    val Array(zone, tag, n) = args.take(3)
    val spark: SparkSession = GraftSession
      .builder(master = "local[2]", shufflePartitions = 2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (i <- 0 until n.toInt) {
      // generous retries: under a two-process race every lost claim is
      // an immediate recompute-and-retry, and losing many in a row is
      // the point of the test
      graft.operators.TxLog.append(spark, zone,
        Seq((tag, i)).toDF("writer", "i"), maxRetries = 50)
    }
    spark.stop()
    println(s"race-probe done $tag $n")
  }
}
