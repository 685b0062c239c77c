package graft

import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** CDC operator pack unit tests, pinned to the reference's semantics
  * (resources/firehose_transformation.py; README.md:43-56 golden scenario —
  * see FIXTURES.md §2). */
class CdcSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  /** The canonical README.md:43-56 three-put scenario (FIXTURES.md §2). */
  val goldenLines: Seq[String] = Seq(
    """{"eventName":"INSERT","dynamodb":{"ApproximateCreationDateTime":1687310602.0,"Keys":{"id":{"S":"864732"},"name":{"S":"Adam"}},"NewImage":{"id":{"S":"864732"},"name":{"S":"Adam"},"Designation":{"S":"Architect"}}}}""",
    """{"eventName":"MODIFY","dynamodb":{"ApproximateCreationDateTime":1687310662.0,"Keys":{"id":{"S":"864732"},"name":{"S":"Adam"}},"NewImage":{"id":{"S":"864732"},"name":{"S":"Adam"},"Designation":{"S":"Sr. Architect"}},"OldImage":{"id":{"S":"864732"},"name":{"S":"Adam"},"Designation":{"S":"Architect"}}}}""",
    """{"eventName":"MODIFY","dynamodb":{"ApproximateCreationDateTime":1687310722.0,"Keys":{"id":{"S":"864732"},"name":{"S":"Adam"}},"NewImage":{"id":{"S":"864732"},"name":{"S":"Adam"},"Designation":{"S":"Developer Advocate"}},"OldImage":{"id":{"S":"864732"},"name":{"S":"Adam"},"Designation":{"S":"Sr. Architect"}}}}""")

  def parseLines(lines: Seq[String]) = {
    import spark.implicits._
    Cdc.parse(lines.toDF("value"))
  }

  test("golden scenario: transform flattens images with audit columns") {
    val out = Cdc.transform(parseLines(goldenLines))
      .orderBy("ingestion_timestamp")
      .collect()
    assert(out.length === 3)
    val designations = out.map(_.getMap[String, String](2)("Designation"))
    assert(designations === Array("Architect", "Sr. Architect", "Developer Advocate"))
    assert(out.map(_.getString(3)) === Array("INSERT", "MODIFY", "MODIFY"))
    assert(out.forall(r => r.getString(0) == "864732" && r.getString(1) == "Adam"))
  }

  test("golden scenario: snapshot keeps exactly the last image") {
    val flat = Cdc.transform(parseLines(goldenLines))
    val snap = Cdc.snapshot(flat, Seq("id", "name"), Seq("ingestion_timestamp")).collect()
    assert(snap.length === 1)
    val r = snap.head
    assert(r.getAs[String]("id") === "864732")
    assert(r.getAs[String]("name") === "Adam")
    assert(r.getAs[Map[String, String]]("attrs")("Designation") === "Developer Advocate")
  }

  test("REMOVE uses OldImage and tombstones the key out of the snapshot") {
    val remove =
      """{"eventName":"REMOVE","dynamodb":{"ApproximateCreationDateTime":1687310800.0,"Keys":{"id":{"S":"864732"},"name":{"S":"Adam"}},"OldImage":{"id":{"S":"864732"},"name":{"S":"Adam"},"Designation":{"S":"Developer Advocate"}}}}"""
    val flat = Cdc.transform(parseLines(goldenLines :+ remove))
    // the REMOVE row itself carries the full prior image (a tombstone row)
    val removeRow = flat.filter(col("Event") === "REMOVE").collect().head
    assert(removeRow.getAs[Map[String, String]]("attrs")("Designation") === "Developer Advocate")
    // ... and the snapshot drops the key entirely
    assert(Cdc.snapshot(flat, Seq("id", "name"), Seq("ingestion_timestamp")).count() === 0)
  }

  test("unknown event and corrupt line route to the error relation with reasons") {
    val bad = Seq(
      """{"eventName":"UPSERT","dynamodb":{"ApproximateCreationDateTime":1.0,"Keys":{},"NewImage":{}}}""",
      """this is not json at all""")
    val (valid, errors) = Cdc.split(parseLines(goldenLines ++ bad))
    assert(valid.count() === 3)
    val reasons = errors.select("error_reason").collect().map(_.getString(0)).sorted
    assert(reasons === Array("corrupt_record", "unknown_event:UPSERT"))
  }

  test("typed-attribute flatten erases every DDB type tag to its value") {
    val line =
      """{"eventName":"INSERT","dynamodb":{"ApproximateCreationDateTime":1.0,"Keys":{"id":{"S":"1"},"name":{"S":"x"}},"NewImage":{"id":{"S":"1"},"name":{"S":"x"},"n":{"N":"42.5"},"b":{"BOOL":"true"},"nul":{"NULL":"true"},"lst":{"L":"[\"a\",1]"},"mp":{"M":"{\"k\":\"v\"}"}}}}"""
    val attrs = Cdc.transform(parseLines(Seq(line)))
      .collect().head.getAs[Map[String, String]]("attrs")
    assert(attrs("n") === "42.5")
    assert(attrs("b") === "true")
    assert(attrs("nul") === "true")
    assert(attrs("lst") === """["a",1]""")
    assert(attrs("mp") === """{"k":"v"}""")
  }

  test("partition columns derive from the ingestion clock (A13)") {
    val flat = Cdc.transform(parseLines(goldenLines))
    val parts = Cdc.withPartitionColumns(flat)
      .select("year", "month", "day", "hour").distinct().collect()
    // 1687310602 = 2023-06-21 01:23:22 UTC; all three events in the same hour
    assert(parts.length === 1)
    val p = parts.head
    assert((p.getInt(0), p.getInt(1), p.getInt(2), p.getInt(3)) === ((2023, 6, 21, 1)))
  }

  test("CDC zone sink writes gzip JSON-lines under hour partitions (A10/A12/A13)") {
    val dir = java.nio.file.Files.createTempDirectory("cdczone").toString
    Cdc.writeCdcZone(Cdc.transform(parseLines(goldenLines)), dir)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .map(_.toString).filter(_.endsWith(".json.gz")).toList
    assert(files.nonEmpty)
    assert(files.forall(_.contains("year=2023/month=6/day=21/hour=1")))
    val back = spark.read.json(s"$dir/year=*/month=*/day=*/hour=*")
    assert(back.count() === 3)
  }
}
