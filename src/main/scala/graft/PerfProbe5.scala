package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Dev probe: q179 collocation lift — spread vs no-spread A/B. */
object PerfProbe5 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(master = "local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noSpread() = {
      val docs = Tables.documents(spark, d)
      TextAnalysis.collocationLiftFromToks(
        docs.select(TextAnalysis.tokens(col("text")).as("toks")), 5L, 1.2)
        .orderBy("bigram")
    }
    def withSpread() =
      TextAnalysis.collocationLift(Tables.documents(spark, d), "text", 5L, 1.2)
        .orderBy("bigram")
    noSpread().count(); withSpread().count() // warm
    for (i <- 1 to 3) {
      var t0 = System.nanoTime()
      noSpread().count()
      println(f"no-spread  $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      t0 = System.nanoTime()
      withSpread().count()
      println(f"with-spread $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
