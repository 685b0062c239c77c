package graft

import org.apache.spark.sql.functions._
import graft.operators.TxLog
import graft.plans.PushdownProbe

/** SQL UPDATE / MERGE INTO / rewrite-DELETE on catalog tables
  * ([[graft.sources.TxLogRowLevelOperation]] — Spark's group-based
  * copy-on-write row-level operations). Every statement is checked for
  * exact rows against an independently computed expectation, and the
  * write-amplification contract (only stats-overlapping files rewritten,
  * via runtime group filtering) is pinned through the commit history. */
class TxLogRowLevelSpec extends SparkSpec {
  import spark.implicits._

  private val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rlo").toString
    spark.conf.set("spark.sql.catalog.grlo", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grlo.warehouse", dir)
    dir
  }

  private var n = 0
  private def fresh(): String = { n += 1; s"grlo.l.t$n" }
  private def zoneOf(t: String): String =
    wh + "/" + t.stripPrefix("grlo.").replace('.', '/')

  /** 4 range-partitioned files over k ∈ [0, 100), tracked stats on k. */
  private def table(): String = {
    val t = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING) TBLPROPERTIES ('statsCols'='k')")
    spark.range(100L).selectExpr("id AS k", "CAST(id % 3 AS STRING) AS v")
      .repartitionByRange(4, col("k"))
      .writeTo(t).append()
    t
  }

  private def rows(t: String): Set[(Long, String)] =
    spark.sql(s"SELECT k, v FROM $t").as[(Long, String)].collect().toSet

  private def baseline: Set[(Long, String)] =
    (0L until 100L).map(k => (k, (k % 3).toString)).toSet

  test("UPDATE rewrites only the files whose stats overlap the matched keys") {
    val t = table()
    val filesBefore = TxLog.latest(spark, zoneOf(t)).get.files.size
    spark.sql(s"UPDATE $t SET v = 'z' WHERE k >= 90")
    assert(rows(t) === baseline.map { case (k, v) => (k, if (k >= 90) "z" else v) })
    val (op, removed) = TxLog.history(spark, zoneOf(t))
      .orderBy(col("gen").desc).select("op", "num_removed")
      .as[(String, Long)].head()
    assert(op === "update")
    assert(removed >= 1L && removed < filesBefore,
      s"runtime group filtering must bound the rewrite: removed $removed of $filesBefore")
  }

  test("UPDATE without WHERE rewrites everything, exactly") {
    val t = table()
    spark.sql(s"UPDATE $t SET v = concat(v, '!')")
    assert(rows(t) === baseline.map { case (k, v) => (k, v + "!") })
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert") {
    val t = table()
    spark.range(95L, 105L).selectExpr("id AS mk",
      "CASE WHEN id < 98 THEN 'del' ELSE 'up' END AS act")
      .createOrReplaceTempView("rlo_src")
    spark.sql(
      s"""MERGE INTO $t USING rlo_src ON k = mk
         |WHEN MATCHED AND act = 'del' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = act
         |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (mk, act)""".stripMargin)
    val expect = baseline
      .filterNot { case (k, _) => k >= 95 && k < 98 }          // deleted
      .map { case (k, v) => (k, if (k >= 98) "up" else v) } ++ // updated
      (100L until 105L).map(k => (k, "up"))                    // inserted
    assert(rows(t) === expect)
    assert(TxLog.history(spark, zoneOf(t))
      .orderBy(col("gen").desc).select("op").as[String].head() === "merge")
  }

  test("DELETE with an unpushable predicate rewrites instead of refusing") {
    val t = table()
    val filesBefore = TxLog.latest(spark, zoneOf(t)).get.files.toSet
    spark.sql(s"DELETE FROM $t WHERE k % 7 = 3")
    assert(rows(t) === baseline.filterNot { case (k, _) => k % 7 == 3 })
    // modulo matches keys in every file: the rewrite replaces the whole
    // zone (correct, unpruned — committed as one full manifest)
    val filesAfter = TxLog.latest(spark, zoneOf(t)).get.files.toSet
    assert(filesAfter.intersect(filesBefore).isEmpty,
      "every pre-delete file held matches and must have been rewritten")
    assert(TxLog.history(spark, zoneOf(t))
      .orderBy(col("gen").desc).select("op").as[String].head() === "delete")
  }

  test("a translatable DELETE still takes the cheaper metadata path (no scan planned)") {
    val t = table()
    PushdownProbe.clear(s"txlog:${zoneOf(t)}")
    spark.sql(s"DELETE FROM $t WHERE k >= 90")
    // Spark's OptimizeMetadataOnlyDeleteFromTable must have converted the
    // rewrite back to SupportsDelete — which never plans a batch scan
    // (probe checked BEFORE any read re-plans one)
    assert(PushdownProbe.get(s"txlog:${zoneOf(t)}").isEmpty,
      "a pushable DELETE must not plan a row-level rewrite scan")
    val (kind, removed) = TxLog.history(spark, zoneOf(t))
      .orderBy(col("gen").desc).select("kind", "num_removed")
      .as[(String, Long)].head()
    assert(kind === "delta" && removed === 1L,
      s"the stats-pruned delete rewrites one file: $kind/$removed")
    assert(rows(t) === baseline.filter(_._1 < 90))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE reaches unmatched target rows") {
    val t = fresh()
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k, 'keep' AS v FROM range(5)")
    spark.range(2L).selectExpr("id AS mk").createOrReplaceTempView("rlo_src2")
    spark.sql(
      s"""MERGE INTO $t USING rlo_src2 ON k = mk
         |WHEN MATCHED THEN UPDATE SET v = 'hit'
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = 'stale'""".stripMargin)
    assert(rows(t) === Set((0L, "hit"), (1L, "hit"),
      (2L, "stale"), (3L, "stale"), (4L, "stale")),
      "unmatched target rows must be reachable by the rewrite")
  }

  test("commitRewrite aborts loudly when the head moved (pinned-snapshot OCC)") {
    val t = table()
    val zone = zoneOf(t)
    val head = TxLog.latest(spark, zone).get
    // stage a replacement dir, then simulate a rival: expect a gen the
    // head has already moved past
    val staged = zone + "/d-occtest"
    spark.range(3L).toDF("k").write.parquet(staged)
    intercept[TxLog.SnapshotMovedException] {
      TxLog.commitRewrite(spark, zone, expectedGen = head.gen - 1,
        removed = head.files, dataDir = staged, op = "update")
    }
    assert(!new java.io.File(staged).exists(),
      "an aborted rewrite must delete its staged files")
    assert(TxLog.latest(spark, zone).get.gen === head.gen,
      "the zone is untouched by the aborted statement")
  }

  test("row-level results survive a reread through every entry point") {
    val t = table()
    spark.sql(s"UPDATE $t SET v = 'u' WHERE k < 10")
    val viaApi = TxLog.read(spark, zoneOf(t)).as[(Long, String)].collect().toSet
    val viaReader = spark.read.format("txlog").option("zone", zoneOf(t)).load()
      .as[(Long, String)].collect().toSet
    assert(viaApi === rows(t) && viaReader === rows(t),
      "catalog SQL, the format reader, and the API must agree after a rewrite")
  }
}
