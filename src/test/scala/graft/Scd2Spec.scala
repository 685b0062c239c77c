package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cdc, Dedup}

/** SCD2 history invariants against the snapshot (q28) it generalizes,
  * and the directional containment metric's asymmetry contract. */
class Scd2Spec extends SparkSpec {

  test("the is_current slice of the SCD2 history IS the LWW snapshot") {
    val flat = Queries.cdcFlattened(spark, sf0001)
      .withColumn("seq_l", col("seq").cast("long"))
    val hist = Cdc.scd2History(flat, Seq("id", "name"),
      Seq("ingestion_timestamp", "seq_l"), eventCol = "event")
    val current = hist.filter(col("is_current"))
      .select("id", "name", "props", "seq", "etype")
    val snap = Cdc.snapshot(flat, Seq("id", "name"),
        Seq("ingestion_timestamp", "seq_l"), eventCol = "event")
      .select("id", "name", "props", "seq", "etype")
    def set(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(set(current) === set(snap),
      "is_current slice diverges from the snapshot operator")
  }

  test("versions never overlap and cover each key's event timeline in order") {
    val flat = Queries.cdcFlattened(spark, sf0001)
      .withColumn("seq_l", col("seq").cast("long"))
    val hist = Cdc.scd2History(flat, Seq("id", "name"),
      Seq("ingestion_timestamp", "seq_l"), eventCol = "event")
    val bad = hist.filter(col("valid_to").isNotNull &&
      col("valid_to") < col("valid_from")).count()
    assert(bad === 0, "a version closes before it opens")
    // at most one current version per key
    val multiCurrent = hist.filter(col("is_current"))
      .groupBy("id", "name").count().filter(col("count") > 1).count()
    assert(multiCurrent === 0, "multiple current versions for one key")
  }

  test("containment flags a near-superset that Jaccard misses") {
    import spark.implicits._
    val big = (1 to 40).map(i => s"w$i").mkString(" ")
    val smallText = (1 to 12).map(i => s"w$i").mkString(" ") // prefix of big
    val docs = Seq((1L, smallText), (2L, big), (3L, "unrelated text entirely here"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cont === Set((1L, 2L)), s"expected only small-in-big containment, got $cont")
    val jac = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5).count()
    assert(jac === 0, "Jaccard should miss the superset pair at 0.5")
  }
}
