package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.streaming.CdcStream

/** SURVEY §5.2 item 4 at fixture scale: the streaming CDC pipeline over
  * many files / multiple triggers / a mid-history restart must produce
  * exactly the batch Q27 relation (content columns; the ingestion clock
  * goes through an epoch-seconds-double round trip, so it is excluded —
  * timestamp semantics are pinned separately by CdcSpec and Q27). */
class CdcStreamEquivalenceSpec extends SparkSpec {

  test("file-streamed CDC over restarts == batch transform at sf0.001") {
    val fixture = Queries.cdcFixture(spark, sf0001)
    val lines = fixture.select(to_json(struct(
      col("eventName"),
      struct(
        col("_ingest_ts").cast("double").as("ApproximateCreationDateTime"),
        col("dynamodb.Keys").as("Keys"),
        col("dynamodb.NewImage").as("NewImage"),
        col("dynamodb.OldImage").as("OldImage")).as("dynamodb"))).as("value"))

    val base = Files.createTempDirectory("cdceq").toString
    val stage = s"$base/stage"; val in = s"$base/in"
    val lake = s"$base/lake"; val err = s"$base/err"; val ckpt = s"$base/ckpt"
    lines.repartition(8).write.text(stage)
    Files.createDirectories(Paths.get(in))
    val files = Files.list(Paths.get(stage)).iterator()
    val parts = new scala.collection.mutable.ArrayBuffer[java.nio.file.Path]
    while (files.hasNext) { val f = files.next(); if (f.toString.endsWith(".txt")) parts += f }
    assert(parts.size === 8)

    // first half of the history, then a full restart, then the rest
    parts.take(4).foreach(f => Files.copy(f, Paths.get(in, f.getFileName.toString)))
    CdcStream.runAvailableNow(spark, in, lake, err, ckpt)
    parts.drop(4).foreach(f => Files.copy(f, Paths.get(in, f.getFileName.toString)))
    CdcStream.runAvailableNow(spark, in, lake, err, ckpt)

    val streamed = spark.read.json(s"$lake/year=*/month=*/day=*/hour=*")
      .select(col("id"), col("name"), col("Event").as("event"),
        get_json_object(col("attrs_json"), "$.seq").as("seq"),
        get_json_object(col("attrs_json"), "$.props").as("props"),
        get_json_object(col("attrs_json"), "$.etype").as("etype"))
      .orderBy(col("seq").cast("long"))
      .collect().map(_.toSeq).toSeq
    val batch = Queries.queryMap("q27_cdc_transform")(spark, sf0001)
      .select(col("id"), col("name"), col("event"), col("seq"), col("props"), col("etype"))
      .collect().map(_.toSeq).toSeq
    assert(streamed.size === batch.size)
    assert(streamed === batch)

    // the invalid rows (event_type 'click') all landed in the error zone
    val clicks = graft.sources.Tables.events(spark, sf0001)
      .filter(col("event_type") === "click").count()
    assert(spark.read.json(err).count() === clicks)
  }
}
