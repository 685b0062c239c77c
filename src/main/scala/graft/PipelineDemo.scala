package graft

import java.nio.file.{Files, Paths}

/** Dev drive: the A17 config -> plan -> run lifecycle through the public
  * API, as a deployment script would use it. */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Files.createTempDirectory("pipedemo").toString
    Files.createDirectories(Paths.get(s"$base/in"))
    Files.write(Paths.get(s"$base/in/f1.json"),
      ("""{"eventName":"INSERT","dynamodb":{"ApproximateCreationDateTime":1687310602.0,"Keys":{"id":{"S":"864732"},"name":{"S":"Adam"}},"NewImage":{"id":{"S":"864732"},"name":{"S":"Adam"},"Designation":{"S":"Architect"}}}}""" + "\n" +
       """{"eventName":"MODIFY","dynamodb":{"ApproximateCreationDateTime":1687310722.0,"Keys":{"id":{"S":"864732"},"name":{"S":"Adam"}},"NewImage":{"id":{"S":"864732"},"name":{"S":"Adam"},"Designation":{"S":"Developer Advocate"}}}}""").getBytes)

    // probe: misconfigured spec must fail at plan time (CDK-synth style)
    try {
      Pipeline.plan(spark, Pipeline.CdcSpec(s"$base/in", s"$base/z", s"$base/z", s"$base/c"))
      println("PROBE FAILED: bad config was accepted")
    } catch {
      case e: IllegalArgumentException => println("plan-time rejection: " + e.getMessage)
    }

    val cdc = Pipeline.plan(spark, Pipeline.CdcSpec(
      s"$base/in", s"$base/lake", s"$base/err", s"$base/ckpt"))
    // probe: read models before ANY run must be empty frames, not errors
    println("pre-run lakeZone rows: " + cdc.lakeZone().count() +
      ", errorZone rows: " + cdc.errorZone().count())
    cdc.runOnce()
    println("lake rows: " + cdc.lakeZone().count())
    println("lake partition columns present: " +
      cdc.lakeZone().columns.count(Set("year", "month", "day", "hour")))
    println("errorZone after clean run: " + cdc.errorZone().count())
    println("snapshot:")
    cdc.snapshot().show(false)

    cdc.compact(s"$base/snap", outputPartitions = 1)
    println("compacted snapshot rows: " + spark.read.parquet(s"$base/snap").count())

    val fl = Pipeline.plan(spark, Pipeline.FullLoadSpec(
      "/root/testdata/sf0.001/customer.parquet", s"$base/full_load",
      workerType = "G.2X", numWorkers = 2, outputPartitions = Some(4)))
    fl.run()
    println(s"full-load rows: ${fl.readBack().count()} in ${fl.readBack().rdd.getNumPartitions} files")
    spark.stop()
  }
}
