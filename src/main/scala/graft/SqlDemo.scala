package graft

/** Dev drive: the registered SQL function surface, as a spark.sql user. */
object SqlDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get() // registerAll is wired in here
    spark.sql("SELECT vec_dot(array(1.0F,2.0F), array(3.0F,4.0F)) AS d, " +
        "vec_norm_sq(array(3.0F,4.0F)) AS n, " +
        "minhash_sig(array(42L, 7L), 4) AS sig").show(false)
    // top-10 cosine via pure SQL over real data (the q34 shape, SQL surface)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb")
    spark.sql(
      """SELECT e.vec_id,
        |       ROUND(vec_dot(e.embedding, q.embedding)
        |             / (SQRT(vec_norm_sq(e.embedding)) * SQRT(vec_norm_sq(q.embedding))), 4) AS sim
        |FROM emb e CROSS JOIN (SELECT embedding FROM emb WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0 ORDER BY sim DESC, vec_id LIMIT 3""".stripMargin).show(false)
    // probe: wrong element type must be a named analysis error, not garbage
    try {
      spark.sql("SELECT vec_dot(array(1.0D,2.0D), array(3.0D,4.0D))").collect()
      println("PROBE FAILED: double arrays accepted")
    } catch { case e: Exception => println("double arrays rejected: " +
      Option(e.getMessage).getOrElse("").linesIterator.find(_.contains("vec_dot")).getOrElse("(msg)").trim.take(90)) }
    // probe: non-literal k must be rejected with a named error
    try {
      spark.sql("SELECT minhash_sig(array(1L), vec_id) FROM emb LIMIT 1").collect()
      println("PROBE FAILED: non-literal k accepted")
    } catch { case e: Exception => println("non-literal k rejected: " +
      Option(e.getMessage).getOrElse("").linesIterator.next()) }
    // deprecation-touched path: byte-weighted repartition still works
    val media = graft.operators.Multimodal.syntheticMedia(spark, 20)
    println("media partitions: " +
      graft.operators.Multimodal.repartitionForMedia(media, 4096).rdd.getNumPartitions)
    spark.stop()
  }
}
