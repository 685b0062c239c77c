package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Cdc

/** Top-level so Spark can derive an Encoder for it. */
case class Ev(id: String, name: String, event: String, seq: Long, payload: String)

/** Property tests (SURVEY.md §5.2-3): the distributed snapshot operator must
  * equal a sequential last-writer-wins fold over any event history. */
class SnapshotPropertySpec extends SparkSpec {

  def checkProp(prop: Prop, minTests: Int = 25): Unit = {
    val params = SCTest.Parameters.default.withMinSuccessfulTests(minTests)
    val result = SCTest.check(params, prop)
    assert(result.passed, result.status.toString)
  }

  val genEv: Gen[Ev] = for {
    id <- Gen.oneOf("1", "2", "3")
    name <- Gen.oneOf("a", "b")
    event <- Gen.oneOf("INSERT", "MODIFY", "REMOVE")
    payload <- Gen.alphaStr.map(_.take(6))
  } yield Ev(id, name, event, 0L, payload)

  val genHistory: Gen[List[Ev]] =
    Gen.listOfN(30, genEv).map(_.zipWithIndex.map { case (e, i) => e.copy(seq = i.toLong) })

  /** Reference model: sequential LWW fold; REMOVE deletes the key. */
  def model(h: List[Ev]): Map[(String, String), Ev] =
    h.foldLeft(Map.empty[(String, String), Ev]) { (acc, e) =>
      if (e.event == "REMOVE") acc - ((e.id, e.name))
      else acc + ((e.id, e.name) -> e)
    }

  test("snapshot == sequential last-writer-wins fold (REMOVE tombstones)") {
    import spark.implicits._
    checkProp(Prop.forAll(genHistory) { h =>
      h.isEmpty || {
        val df = h.toDF()
          .withColumn("ingestion_timestamp", timestamp_micros(col("seq")))
        val snap = Cdc.snapshot(df, Seq("id", "name"), Seq("ingestion_timestamp", "seq"),
            eventCol = "event")
          .select("id", "name", "seq").collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        val expected = model(h).map { case (k, e) => k -> e.seq }
        snap == expected
      }
    })
  }
}
