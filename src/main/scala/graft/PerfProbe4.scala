package graft

/** Dev probe: q73 plan + steady-state timing at 32 cores, sf0.1. */
object PerfProbe4 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    val q = Queries.queryMap("q73_tpch_q5")
    q(spark, "/root/testdata/sf0.001").count() // warm
    q(spark, d).explain("formatted")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      q(spark, d).count()
      println(f"q73 run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
