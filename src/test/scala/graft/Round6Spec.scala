package graft

import graft.operators.TxLog

/** Round-6 additions: the declared TxLog pruned-read query's IO shape —
  * CORRECTNESS pins its rows; this pins that those rows were produced by
  * scanning ONLY the stats-overlapping files. */
class Round6Spec extends SparkSpec {

  test("q156: the TxLog scan reads only shipdate-overlapping files") {
    val df = Queries.queryMap("q156_txlog_pruned_read")(spark, sf0001)
    val zone = Round6Queries.shipdateZone(spark, sf0001)
    val head = TxLog.latest(spark, zone).get
    val keep = TxLog.prunedFilesFor(head, "l_shipdate", "1996-01-01 00:00:00", "1996-03-31 23:59:59")
    assert(df.inputFiles.length === keep.size,
      s"scan touched ${df.inputFiles.length} files, pruned list has ${keep.size}")
    assert(keep.size < head.files.size,
      s"no skipping happened: ${keep.size} of ${head.files.size} files")
    assert(df.count() > 0, "the pruned read returned no rows")
    // every returned row actually satisfies the predicate (pruning is an
    // optimization, never a filter substitute)
    import org.apache.spark.sql.functions.col
    assert(df.filter(col("l_shipdate").cast("string") < "1996-01-01 00:00:00" ||
      col("l_shipdate").cast("string") > "1996-03-31 23:59:59").count() === 0L)
    // manifest pruning COMPOSES with parquet row-group skipping: the
    // exact predicate must reach the scan (literal cast to the column's
    // type, never the column to the literal's)
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    val plan = df.queryExecution.executedPlan.toString
    val pushed = "PushedFilters: \\[[^\\]]*l_shipdate[^\\]]*\\]".r
    assert(pushed.findFirstIn(plan).isDefined,
      s"range predicate did not push into the parquet scan:\n$plan")
  }

  test("q157: the Z-ordered zone prunes on the INTERSECTION of both columns' stats") {
    val df = Queries.queryMap("q157_txlog_zorder_pruned")(spark, sf0001)
    val zone = Round6Queries.zorderZone(spark, sf0001)
    val head = TxLog.latest(spark, zone).get
    val keepPart = TxLog.prunedFilesFor(head, "l_partkey", 50, 120).toSet
    val keepQty = TxLog.prunedFilesFor(head, "l_quantity", 10, 20).toSet
    val both = (keepPart intersect keepQty).size
    assert(df.inputFiles.length === both,
      s"scan touched ${df.inputFiles.length} files, intersection has $both")
    // the conjunction must prune strictly harder than either column alone
    assert(both < math.min(keepPart.size, keepQty.size) ||
      both < head.files.size,
      s"no intersection pruning: $both of ${head.files.size}")
    assert(df.count() > 0)
  }

  test("knnJoinIvf with every cell probed equals the brute-force top-k") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Similarity
    import graft.functions.VectorFunctions.cosine
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val cents = ExtendedQueries.trainedCentroids16(spark, sf0001)
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val corpus = emb.filter(col("vec_id") >= 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "vec_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // nProbe = all cells: the IVF path must reproduce the exact answer
    val ivf = Similarity.knnJoinIvf(corpus, queries, cents, k = 3, nProbe = cents.size)
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
    val exact = queries.crossJoin(corpus)
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("qe"), col("embedding")), 4).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
    assert(rows(ivf) === rows(exact),
      "probing every cell must equal the brute-force k-NN join")
    // partial probing returns a well-formed subset: k rows per query,
    // consecutive ranks from 1
    val part = Similarity.knnJoinIvf(corpus, queries, cents, k = 3, nProbe = 2)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank")))
    part.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to rs.size.toLong).toSeq,
        s"query $q has non-consecutive ranks")
    }
  }

  test("q158: the pinned gen-1 snapshot is isolated from the later append") {
    val rows = Queries.queryMap("q158_txlog_time_travel")(spark, sf0001).count()
    val (zone, gen1) = Round6Queries.timeTravelZone(spark, sf0001)
    val headGen = TxLog.latest(spark, zone).get.gen
    assert(headGen > gen1.gen, "the append should have advanced the head")
    val full = TxLog.read(spark, zone).count()
    assert(rows > 0 && full > rows,
      s"head read ($full rows) should strictly contain the pinned snapshot ($rows rows)")
  }
}
