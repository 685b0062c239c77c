package graft

import org.apache.spark.sql.functions._
import graft.operators.TxLog
import graft.plans.PushdownProbe

/** The injected maintenance grammar ([[graft.plans.GraftSqlParser]]):
  * `VACUUM` / `OPTIMIZE [ZORDER BY]` / `RESTORE ... VERSION AS OF` as
  * SQL statements over catalog tables and quoted zone paths, each
  * running the library primitive and returning its stats as result
  * rows. Non-maintenance SQL must pass through the delegate parser
  * bit-identically. */
class GraftMaintenanceSqlSpec extends SparkSpec {
  import spark.implicits._

  private val wh: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_maint").toString
    spark.conf.set("spark.sql.catalog.gmnt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gmnt.warehouse", dir)
    dir
  }

  private var n = 0
  private def fresh(): String = { n += 1; s"gmnt.m.t$n" }
  private def zoneOf(t: String): String =
    wh + "/" + t.stripPrefix("gmnt.").replace('.', '/')

  test("OPTIMIZE bin-packs small files; rows identical") {
    val t = fresh()
    spark.sql(s"CREATE TABLE $t (k BIGINT)")
    (0 until 5).foreach(i =>
      spark.sql(s"INSERT INTO $t SELECT id + ${i * 10} FROM range(10)"))
    val before = TxLog.latest(spark, zoneOf(t)).get.files.size
    val st = spark.sql(s"OPTIMIZE $t")
      .select("files_before", "files_after", "rewritten")
      .as[(Long, Long, Boolean)].head()
    assert(st._3 && st._1 === before.toLong && st._2 < st._1,
      s"optimize must shrink the file count: $st")
    assert(spark.sql(s"SELECT k FROM $t").as[Long].collect().sorted.toSeq ===
      (0 until 5).flatMap(i => (0 until 10).map(j => (i * 10 + j).toLong)).sorted)
  }

  test("OPTIMIZE ZORDER BY rewrites clustered; range queries prune after") {
    val t = fresh()
    spark.sql(s"CREATE TABLE $t (x BIGINT, y BIGINT, payload STRING) " +
      "TBLPROPERTIES ('statsCols'='x,y')")
    // scattered layout: every natural file spans the whole (x, y) space,
    // so two-column range queries cannot prune until the Z-order rewrite
    spark.range(4000L).selectExpr("id * 7 % 100 AS x", "id * 13 % 100 AS y",
      "uuid() AS payload")
      .writeTo(t).append()
    val expect = spark.sql(
      s"SELECT count(*) FROM $t WHERE x BETWEEN 10 AND 19 AND y BETWEEN 10 AND 19")
      .as[Long].head()
    // small target so the rewrite yields enough z-ordered files for the
    // pruning to show (the conf-tunable form of compactClustered's
    // targetBytes)
    spark.conf.set("spark.graft.optimize.target.bytes", "2048")
    val st = try spark.sql(s"OPTIMIZE $t ZORDER BY (x, y)")
      .select("files_after", "rewritten").as[(Long, Boolean)].head()
    finally spark.conf.unset("spark.graft.optimize.target.bytes")
    assert(st._2 && st._1 >= 8L, s"need enough files for pruning to show: $st")
    PushdownProbe.clear(s"txlog:${zoneOf(t)}")
    val got = spark.sql(
      s"SELECT count(*) FROM $t WHERE x BETWEEN 10 AND 19 AND y BETWEEN 10 AND 19")
      .as[Long].head()
    assert(got === expect, "the rewrite must not change content")
    val (served, total) = PushdownProbe.get(s"txlog:${zoneOf(t)}").get
    assert(served < total / 2,
      s"z-ordered stats must prune the two-column range: $served/$total")
  }

  test("RESTORE TABLE ... TO VERSION AS OF rolls back as a new commit") {
    val t = fresh()
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(5)")
    val g1 = TxLog.latest(spark, zoneOf(t)).get.gen
    spark.sql(s"INSERT INTO $t SELECT id + 100 FROM range(5)")
    val res = spark.sql(s"RESTORE TABLE $t TO VERSION AS OF $g1")
      .select("restored_to", "new_gen").as[(Long, Long)].head()
    assert(res._1 === g1 && res._2 > g1, "restore lands a NEW generation")
    assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() === 5L)
    assert(spark.sql(s"SELECT max(k) FROM $t").as[Long].head() === 4L,
      "the insert's rows are rolled back")
  }

  test("VACUUM RETAIN folds history; vacuumed generations refuse time travel") {
    val t = fresh()
    spark.sql(s"CREATE TABLE $t AS SELECT id AS k FROM range(5)")
    val g1 = TxLog.latest(spark, zoneOf(t)).get.gen
    spark.sql(s"INSERT OVERWRITE $t SELECT id + 10 FROM range(5)")
    spark.sql(s"INSERT OVERWRITE $t SELECT id + 20 FROM range(5)")
    spark.conf.set("spark.graft.vacuum.grace.ms", "0")
    try {
      val deleted = spark.sql(s"VACUUM $t RETAIN 1 GENERATIONS")
        .select("deleted_files").as[Long].head()
      assert(deleted >= 1L,
        "the overwritten generations' files must be reclaimed")
    } finally spark.conf.unset("spark.graft.vacuum.grace.ms")
    assert(spark.sql(s"SELECT min(k) FROM $t").as[Long].head() === 20L,
      "the head survives vacuum")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $t VERSION AS OF $g1").collect()
    }
  }

  test("a quoted zone path is a valid target (zones outside any warehouse)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_maint_path").toString
    val zone = dir + "/z"
    (0 until 3).foreach(_ =>
      TxLog.append(spark, zone, spark.range(10L).toDF("k")))
    val st = spark.sql(s"OPTIMIZE '$zone'")
      .select("files_after", "rewritten").as[(Long, Boolean)].head()
    assert(st._2, "path-target optimize must run")
    assert(TxLog.read(spark, zone).count() === 30L)
  }

  test("unqualified and non-graft-catalog targets refuse loudly") {
    intercept[Exception] { spark.sql("VACUUM baretable") }
    intercept[Exception] { spark.sql("VACUUM spark_catalog.db.t") }
  }

  test("backquoted segments with hyphens/spaces resolve as targets") {
    // Round-10 advice: the old `[\\w`.]+` target pattern could not span a
    // backquoted segment containing a hyphen, so VACUUM gmnt.m.`my-table`
    // fell through to the delegate parser and died with an unrelated
    // syntax error. The segment alternative must capture it.
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gmnt.m")
    spark.sql("CREATE TABLE gmnt.m.`my-table` (k BIGINT)")
    (0 until 3).foreach(_ =>
      spark.sql("INSERT INTO gmnt.m.`my-table` SELECT id FROM range(5)"))
    val st = spark.sql("OPTIMIZE gmnt.m.`my-table`")
      .select("rewritten").as[Boolean].head()
    assert(st, "OPTIMIZE over a backquoted hyphenated table must run")
    assert(spark.sql("VACUUM gmnt.m.`my-table` RETAIN 2 GENERATIONS")
      .columns.nonEmpty)
    assert(spark.sql("SELECT COUNT(*) FROM gmnt.m.`my-table`")
      .as[Long].head() === 15L)
  }

  test("non-maintenance SQL passes through the delegate parser untouched") {
    assert(spark.sql("SELECT 1 AS vacuum_plan").as[Int].head() === 1)
    // keywords INSIDE a larger statement never match the anchored grammar
    assert(spark.sql("SELECT 'VACUUM x RETAIN 2 GENERATIONS' AS s")
      .as[String].head().startsWith("VACUUM"))
    intercept[Exception] { spark.sql("VACUUM") } // still a parse error
  }
}
