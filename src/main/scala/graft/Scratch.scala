package graft

/** Dev smoke: drives SparkEntry.entry like the driver's t1 check. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, false)
    println(s"entry rows=$n")
    spark.stop()
  }
}
