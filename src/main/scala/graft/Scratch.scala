package graft

/** Dev-only scratch probe. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"
    def time2(name: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s (warm)")
    }
    Queries.queryMap("q56_dup_clusters")(spark, "/root/testdata/sf0.001").count()
    time2("q56") { Queries.queryMap("q56_dup_clusters")(spark, d).count() }
    spark.stop()
  }
}
