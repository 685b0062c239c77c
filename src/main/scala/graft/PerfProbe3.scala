package graft

/** Dev-only: isolate where the graph-family time goes at a given sf —
  * the shared fulfillment-edge build vs each operator's own work. */
object PerfProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (rows=$n)")
    }
    time("q180 warm @sf0.001") {
      Queries.queryMap("q180_cdc_chunk_dedup")(spark, "/root/testdata/sf0.001").count()
    }
    time("q180 timed") { Queries.queryMap("q180_cdc_chunk_dedup")(spark, d).count() }
    time("q180 timed again") { Queries.queryMap("q180_cdc_chunk_dedup")(spark, d).count() }
    spark.stop()
  }
}
