package graft

/** Dev-only: time individual queries at a given sf dir with warmup.
  * Usage: runMain graft.PerfProbe2 <sfDir> <queryName> [queryName...] */
object PerfProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q69_ann_kmeans")
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    val warmDir = Bench.warmDirFor(sfDir)
    names.foreach { n0 =>
      val doExplain = n0.startsWith("explain:")
      val n = if (doExplain) n0.stripPrefix("explain:") else n0
      val fn = SparkEntry.queries(n)
      if (doExplain) { fn(spark, sfDir).explain("formatted") }
      fn(spark, warmDir).count() // warm
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        println(f"$n%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$rows)")
      }
    }
    spark.stop()
  }
}
