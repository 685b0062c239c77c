package graft

/** Dev-only scratch probe: plan red-flag sweep over every query. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.001"
    Queries.inventory.foreach { q =>
      try {
        val p = q.run(spark, d).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> "CartesianProduct".r.findAllIn(p).length,
          "BNLJ" -> "BroadcastNestedLoopJoin".r.findAllIn(p).length,
          "SortMergeJoin" -> "SortMergeJoin".r.findAllIn(p).length,
          "Exchange" -> "Exchange".r.findAllIn(p).length)
          .filter(_._2 > 0).map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(f"${q.name}%-28s $flags")
      } catch { case e: Throwable => println(s"${q.name} ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
