package graft

import org.apache.spark.sql.functions._
import graft.operators.{PageRank, Profile, Similarity, TxLog}

/** Round-7 fourth block semantics: personalized-PageRank seed locality,
  * sign-bit code edges, the overlap-chunker guarantee, and the one-pass
  * profiler contract. */
class Round7dSpec extends SparkSpec {
  import spark.implicits._

  test("personalized PageRank: rank stays in the seeds' forward closure") {
    // 1 -> 2 -> 3;  10 -> 11 (disconnected from the seed)
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val g = PageRank.buildGraph(edges, "src", "dst")
    val r = PageRank.fixedPointPersonalized(g, Seq(1L), iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) === PageRank.Base, "seed keeps only its base after emitting")
    assert(r(2L) > 0L && r(3L) > 0L, "reachable nodes must accumulate rank")
    assert(r(10L) === 0L && r(11L) === 0L,
      "nodes outside the seed closure must stay at zero")
  }

  test("signBitCode: bit per positive dim, clamped width, missing half is 0") {
    val vs = Seq((1L, Array(1.0f, -1.0f, 0.0f, 2.0f))).toDF("vec_id", "embedding")
    val r = vs.select(
        Similarity.signBitCode("embedding", 1, 32).as("lo"),
        Similarity.signBitCode("embedding", 33, 32).as("hi"))
      .as[(Long, Long)].head()
    assert(r._1 === 9L, s"bits 0 and 3 -> 9, got ${r._1}") // 1>0, 2>0
    assert(r._2 === 0L, "dims past the vector length contribute nothing")
  }

  test("overlap chunker: stride-24 windows share an 8-token overlap") {
    val rows = Queries.queryMap("q216_overlap_chunks")(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") === 0L).collect()
    val nTok = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") === 0L)
      .select(size(graft.operators.TextAnalysis.tokens(col("text"))))
      .head().getInt(0)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (idx, start, len) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(start === 1L + idx * 24L, "starts advance by the stride")
      assert(len === math.min(32L, nTok - start + 1L), "tail clamps")
    }
    // consecutive chunks overlap by 32 - 24 = 8 tokens (when both full)
    val full = rows.filter(_.getLong(3) === 32L)
    if (full.length >= 2)
      assert(full(0).getLong(2) + 32L - full(1).getLong(2) === 8L)
  }

  test("restore: manifest-level rollback, history intact, no-op on head") {
    val zone = java.nio.file.Files.createTempDirectory("r7d_restore")
      .toString + "/zone"
    val g1 = TxLog.replace(spark, zone,
      spark.range(100L).toDF("id").repartitionByRange(4, $"id"),
      statsCols = Seq("id")).gen
    TxLog.deleteWhereCol(spark, zone, "id", 0, 49)
    assert(TxLog.read(spark, zone).count() === 50L)
    val restored = TxLog.restore(spark, zone, g1)
    assert(TxLog.read(spark, zone).count() === 100L, "restore must revive the rows")
    assert(restored.gen > g1 + 1, "restore commits a NEW generation")
    // the deleted-state generation is still time-travelable
    val mid = TxLog.snapshotAt(spark, zone, restored.gen - 1).get
    assert(TxLog.readSnapshot(spark, zone, mid).count() === 50L)
    // restoring to the current head is a no-op
    assert(TxLog.restore(spark, zone, restored.gen).gen === restored.gen)
    // stats came back with the restored files: pruning works
    assert(TxLog.metadataCount(spark, zone) === Some(100L))
    intercept[RuntimeException] { TxLog.restore(spark, zone, 999L) }
  }

  test("assortativity: hand-checked triangle, zero-variance guard") {
    // 1->2, 1->3, 2->3: x=(2,2,1), y=(1,2,2) -> r = -1/2
    val e1 = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val r1 = Round7dQueries.assortativity(e1).as[(Long, Double)].head()
    assert(r1 === ((3L, -0.5)))
    // a star has zero out-degree variance -> guarded 0
    val e2 = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    assert(Round7dQueries.assortativity(e2).as[(Long, Double)].head() === ((3L, 0.0)))
  }

  test("profiler: exact counts, null bounds for strings, one scan") {
    val df = Seq(
      (1L, Some("a"), 1.5), (2L, None, 2.5), (3L, Some("a"), 1.5)
    ).toDF("id", "s", "v")
    val p = Profile.profile(df, Seq("id", "s", "v")).orderBy("col_name")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.get(4)), Option(r.get(5))))).toMap
    assert(p("id") === ((3L, 0L, 3L, Some(1.0), Some(3.0))))
    assert(p("s") === ((3L, 1L, 1L, None, None)))
    assert(p("v") === ((3L, 0L, 2L, Some(1.5), Some(2.5))))
    val scans = Profile.profile(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("LocalTableScan"))
    assert(scans <= 2, "profiler must not re-scan per column")
  }
}
