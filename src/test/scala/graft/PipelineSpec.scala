package graft

import java.nio.file.{Files, Paths}

/** A17: config -> plan -> run lifecycle (plan-time validation like CDK
  * synth; end-to-end execution of both pipelines from specs). */
class PipelineSpec extends SparkSpec {

  test("bad config fails at plan time, not run time") {
    intercept[IllegalArgumentException] {
      Pipeline.plan(spark, Pipeline.CdcSpec("", "l", "e", "c"))
    }
    intercept[IllegalArgumentException] {
      Pipeline.plan(spark, Pipeline.CdcSpec("i", "same", "same", "c"))
    }
    intercept[IllegalArgumentException] {
      Pipeline.plan(spark, Pipeline.FullLoadSpec("s", "d", numWorkers = 0))
    }
  }

  test("CDC spec runs end-to-end and exposes the lake read model") {
    val base = Files.createTempDirectory("pipespec").toString
    Files.createDirectories(Paths.get(s"$base/in"))
    Files.write(Paths.get(s"$base/in/f1.json"),
      ("""{"eventName":"INSERT","dynamodb":{"ApproximateCreationDateTime":1687310602.0,"Keys":{"id":{"S":"7"},"name":{"S":"n"}},"NewImage":{"id":{"S":"7"},"name":{"S":"n"},"x":{"S":"1"}}}}""" + "\n" +
       """{"eventName":"MODIFY","dynamodb":{"ApproximateCreationDateTime":1687310700.0,"Keys":{"id":{"S":"7"},"name":{"S":"n"}},"NewImage":{"id":{"S":"7"},"name":{"S":"n"},"x":{"S":"2"}}}}""").getBytes)
    val plan = Pipeline.plan(spark, Pipeline.CdcSpec(
      s"$base/in", s"$base/lake", s"$base/err", s"$base/ckpt"))
    plan.runOnce()
    assert(plan.lakeZone().count() === 2)
    val snap = plan.snapshot().collect()
    assert(snap.length === 1)
    assert(snap.head.getAs[String]("attrs_json").contains("\"x\":\"2\""))
  }

  test("full-load spec snapshots source to dest with the fleet-derived split count") {
    val base = Files.createTempDirectory("flspec").toString
    val spec = Pipeline.FullLoadSpec(s"$sf0001/nation.parquet", s"$base/out",
      workerType = "G.1X", numWorkers = 2, outputPartitions = Some(2))
    assert(spec.splits === 8)
    val plan = Pipeline.plan(spark, spec)
    plan.run()
    assert(plan.readBack().count() === 25)
    assert(plan.readBack().rdd.getNumPartitions === 2)
  }

  test("compaction materializes the snapshot as overwrite parquet") {
    val base = Files.createTempDirectory("compactspec").toString
    Files.createDirectories(Paths.get(s"$base/in"))
    Files.write(Paths.get(s"$base/in/f1.json"),
      ("""{"eventName":"INSERT","dynamodb":{"ApproximateCreationDateTime":1687310602.0,"Keys":{"id":{"S":"1"},"name":{"S":"a"}},"NewImage":{"id":{"S":"1"},"name":{"S":"a"},"x":{"S":"1"}}}}""" + "\n" +
       """{"eventName":"INSERT","dynamodb":{"ApproximateCreationDateTime":1687310603.0,"Keys":{"id":{"S":"2"},"name":{"S":"b"}},"NewImage":{"id":{"S":"2"},"name":{"S":"b"},"x":{"S":"5"}}}}""" + "\n" +
       """{"eventName":"REMOVE","dynamodb":{"ApproximateCreationDateTime":1687310700.0,"Keys":{"id":{"S":"2"},"name":{"S":"b"}},"OldImage":{"id":{"S":"2"},"name":{"S":"b"},"x":{"S":"5"}}}}""").getBytes)
    val plan = Pipeline.plan(spark, Pipeline.CdcSpec(
      s"$base/in", s"$base/lake", s"$base/err", s"$base/ckpt"))
    plan.runOnce()
    plan.compact(s"$base/snap", outputPartitions = 1)
    val snap = spark.read.parquet(s"$base/snap")
    assert(snap.count() === 1) // key 2 tombstoned
    assert(snap.select("id").collect().head.getString(0) === "1")
    plan.compact(s"$base/snap", outputPartitions = 1) // idempotent overwrite
    assert(spark.read.parquet(s"$base/snap").count() === 1)
  }
}
