package graft

/** Dev-only scratch probe. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"
    def time2(name: String)(f: => Long): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s (warm)")
    }
    Queries.queryMap("q08_join_multiway")(spark, "/root/testdata/sf0.001").count()
    Seq("q36_dedup_ngram_jaccard","q37_dedup_minhash_lsh","q46_dedup_simhash_pairs",
        "q56_dup_clusters","q38_dedup_simhash").foreach { q =>
      time2(q) { Queries.queryMap(q)(spark, d).count() }
    }
    spark.stop()
  }
}
