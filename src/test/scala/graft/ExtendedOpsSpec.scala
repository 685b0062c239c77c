package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Dedup, Sessionize}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("gap-based assignment: new session when gap reaches threshold (end-exclusive)") {
    val df = Seq(
      (1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(2000), 3L), (1L, ts(2010), 4L),
      (2L, ts(0), 5L),
      (3L, ts(0), 6L), (3L, ts(1800), 7L), (3L, ts(3599), 8L))
      .toDF("user_id", "ts", "event_id")
    val out = Sessionize.assign(df, Seq("user_id"), "ts", "event_id", gapSeconds = 1800L)
      .orderBy("user_id", "event_id")
      .select("user_id", "event_id", "session_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out === Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 2L),
      (2L, 5L, 1L),
      // exactly prev+gap opens a NEW session (session_window [start, end));
      // 1799s later stays inside
      (3L, 6L, 1L), (3L, 7L, 2L), (3L, 8L, 2L)))
  }

  test("equal timestamps order deterministically by the sequence column") {
    val df = Seq((1L, ts(0), 2L), (1L, ts(0), 1L)).toDF("user_id", "ts", "event_id")
    val out = Sessionize.assign(df, Seq("user_id"), "ts", "event_id", 60L)
      .select("event_id", "session_id").orderBy("event_id").collect()
    // both in one session regardless of row arrival order
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 1L))
  }
}

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("latest at-or-before reference value per probe; null when none") {
    val refs = Seq((1L, ts(1), 10L, 10.0), (1L, ts(5), 11L, 50.0))
      .toDF("user_id", "ts", "event_id", "value")
    val probes = Seq((1L, ts(0), 20L), (1L, ts(1), 21L), (1L, ts(3), 22L), (1L, ts(7), 23L))
      .toDF("user_id", "ts", "event_id")
    val out = AsOf.joinLatest(probes, refs, Seq("user_id"), "ts", "event_id", "value")
      .orderBy("event_id")
      .select("event_id", "asof_value")
      .collect()
    assert(out(0).isNullAt(1))                 // t=0: no prior ref
    assert(out(1).getDouble(1) === 10.0)       // t=1: inclusive <=
    assert(out(2).getDouble(1) === 10.0)       // t=3: latest prior
    assert(out(3).getDouble(1) === 50.0)       // t=7
  }

  test("equal-timestamp references resolve to the greatest sequence id") {
    val refs = Seq((1L, ts(1), 1L, 10.0), (1L, ts(1), 2L, 20.0))
      .toDF("user_id", "ts", "event_id", "value")
    val probes = Seq((1L, ts(2), 9L)).toDF("user_id", "ts", "event_id")
    val out = AsOf.joinLatest(probes, refs, Seq("user_id"), "ts", "event_id", "value")
      .select("asof_value").collect()
    assert(out(0).getDouble(0) === 20.0)
  }

  test("keys never borrow references from other keys") {
    val refs = Seq((1L, ts(1), 1L, 10.0)).toDF("user_id", "ts", "event_id", "value")
    val probes = Seq((2L, ts(5), 9L)).toDF("user_id", "ts", "event_id")
    val out = AsOf.joinLatest(probes, refs, Seq("user_id"), "ts", "event_id", "value")
      .select("asof_value").collect()
    assert(out(0).isNullAt(0))
  }

  test("a null-VALUED latest reference wins over older non-null values") {
    // ref@t=1 has value 10.0; ref@t=5 exists but its value is null. A probe
    // at t=7 must see null (the latest reference), NOT carry 10.0 forward —
    // "latest value is null" and "no reference yet" are distinct states.
    val refs = Seq((1L, ts(1), 10L, Some(10.0)), (1L, ts(5), 11L, None))
      .toDF("user_id", "ts", "event_id", "value")
    val probes = Seq((1L, ts(3), 20L), (1L, ts(7), 21L))
      .toDF("user_id", "ts", "event_id")
    val out = AsOf.joinLatest(probes, refs, Seq("user_id"), "ts", "event_id", "value")
      .orderBy("event_id").select("asof_value").collect()
    assert(out(0).getDouble(0) === 10.0) // t=3: before the null ref
    assert(out(1).isNullAt(0))           // t=7: null ref shadows 10.0
  }
}

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("components resolve to the minimum node id") {
    val edges = Seq((2L, 1L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val out = Dedup.connectedComponents(edges)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L)))
  }

  test("chains longer than one hop converge (multi-iteration propagation)") {
    // path 1-2-3-4-5-6-7: min label must travel the full diameter.
    // smallGraphEdges=0 forces the DISTRIBUTED loop (the 100 TB path).
    val edges = (1L until 7L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val out = Dedup.connectedComponents(edges, smallGraphEdges = 0L)
      .select("label").distinct().collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L))
  }

  test("driver union-find fallback == distributed propagation") {
    val edges = Seq((2L, 1L), (2L, 3L), (9L, 8L), (4L, 5L), (5L, 6L), (6L, 4L))
      .toDF("a_id", "b_id")
    val small = Dedup.connectedComponents(edges)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dist = Dedup.connectedComponents(edges, smallGraphEdges = 0L)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(small === dist)
  }

  test("empty edge set yields empty labeling") {
    val edges = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.connectedComponents(edges).count() === 0L)
  }

  test("non-integral node ids are rejected loudly (no silent ANSI cast)") {
    val edges = Seq(("a", "b")).toDF("a_id", "b_id")
    val e = intercept[IllegalArgumentException](Dedup.connectedComponents(edges))
    assert(e.getMessage.contains("integral"))
  }
}

/** Plan-shape assertions for the round-2 operators: the properties that
  * keep them viable at 100 TB. */
class ExtendedPlanSpec extends SparkSpec {
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("as-of join plans as union + window: NO join operator, no range explosion") {
    val p = plan(Queries.queryMap("q54_asof_join")(spark, sf0001))
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(p.contains("Window"), "expected a window operator")
  }

  test("sessionize + session aggregate reuse one partitioning (single exchange)") {
    val p = plan(Queries.queryMap("q49_sessionize")(spark, sf0001))
    // window partitions by user_id; the (user_id, session_id) groupBy is
    // satisfied by the same hash partitioning -> no second shuffle before
    // the final presentation sort
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected 1 hash exchange, got $exchanges:\n$p")
  }
}

/** Batch Sessionize.assign and Structured Streaming session_window are two
  * formulations of the same gap semantics — their session boundaries and
  * per-session counts must agree on identical input. */
class SessionizeStreamEquivalenceSpec extends SparkSpec {
  test("batch gap sessions == streaming session_window sessions (sf0.001 events)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val events = graft.sources.Tables.events(spark, sf0001)
      .select($"ts", $"user_id", $"event_type", $"value").as[EventRow]
    val rows = events.collect().toSeq
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
    mem.addData(rows)
    val q = graft.streaming.StreamOps.sessionAgg(mem.toDF(), "ts", "user_id", gap = "30 minutes")
      .writeStream.format("memory").queryName("sess_eq").outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sess_eq")
      .select(date_format($"session_start", "yyyy-MM-dd HH:mm:ss").as("start"),
        $"user_id".cast("long").as("user_id"), $"cnt")
      .orderBy("user_id", "start").collect()
    val batch = graft.operators.Sessionize
      .assign(events.toDF(), Seq("user_id"), "ts", "value", gapSeconds = 1800L)
      .groupBy($"user_id", $"session_id")
      .agg(date_format(min($"ts"), "yyyy-MM-dd HH:mm:ss").as("start"), count(lit(1)).as("cnt"))
      .select($"start", $"user_id", $"cnt")
      .orderBy("user_id", "start").collect()
    assert(streamed.toSeq === batch.toSeq)
  }
}

class KMeansSpec extends SparkSpec {
  import graft.operators.Similarity

  test("deterministic across runs; improves mean cosine to assigned centroid") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    def run() = Similarity.kmeans(emb, k = 4, iterations = 3)
    val c1 = run().orderBy("cent_id").collect().map(_.getSeq[Float](1).toSeq).toSeq
    val c2 = run().orderBy("cent_id").collect().map(_.getSeq[Float](1).toSeq).toSeq
    assert(c1 === c2, "k-means is not run-to-run deterministic")

    def objective(cents: org.apache.spark.sql.DataFrame): Double =
      Similarity.assignToCentroids(emb, cents)
        .join(cents, "cent_id")
        .select(avg(graft.functions.VectorFunctions
          .cosine(col("embedding"), col("ce"))).as("o"))
        .collect().head.getDouble(0)
    val init = emb.orderBy("vec_id").limit(4)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    val trained = run()
    assert(objective(trained) >= objective(init) - 1e-9,
      "training made the mean assigned cosine worse")
  }

  test("every vector is assigned to exactly one of k cells") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = Similarity.kmeans(emb, k = 4, iterations = 2)
    val assigned = Similarity.assignToCentroids(emb, cents)
    assert(assigned.count() === emb.count())
    assert(assigned.select("cent_id").distinct().count() <= 4)
  }

  test("literal map-side assignment == distributed crossJoin assignment") {
    // same argmax + tie semantics, different plan shape (zero shuffles vs
    // crossJoin+groupBy) — every vector must land in the same cell.
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val cents = Similarity.kmeans(emb, k = 4, iterations = 2)
    val dist = Similarity.assignToCentroids(emb, cents)
      .select("vec_id", "cent_id").orderBy("vec_id").collect().toSeq
    val local = Similarity.assignToCentroidsLocal(emb, Similarity.collectCentroids(cents))
      .select("vec_id", "cent_id").orderBy("vec_id").collect().toSeq
    assert(local === dist)
  }
}

/** Stream-stream interval join == the equivalent batch range join. */
class IntervalJoinSpec extends SparkSpec {
  test("purchases x views within +-10 minutes per user: stream == batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select($"ts", $"user_id", $"event_type", $"value").as[EventRow]
    val rows = ev.collect().toSeq
    def mem() = {
      val m = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
      m.addData(rows); m
    }
    val purchases = mem().toDF().filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    val views = mem().toDF().filter($"event_type" === "view")
      .select($"user_id", $"ts", $"value".as("view_value"))
    val q = graft.streaming.StreamOps
      .intervalJoin(purchases, views, "user_id", "ts")
      .writeStream.format("memory").queryName("ij").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("ij")
      .select($"user_id", $"ts", $"ts_r", round($"value", 4).as("pv"),
        round($"view_value", 4).as("vv"))
      .orderBy("user_id", "ts", "ts_r").collect()

    val bp = ev.toDF().filter($"event_type" === "purchase").select($"user_id", $"ts", $"value")
    val bv = ev.toDF().filter($"event_type" === "view")
      .select($"user_id".as("user_id_r"), $"ts".as("ts_r"), $"value".as("view_value"))
    val batch = bp.join(bv,
        $"user_id" === $"user_id_r" &&
          $"ts_r" >= $"ts" - expr("INTERVAL 10 minutes") &&
          $"ts_r" <= $"ts" + expr("INTERVAL 10 minutes"))
      .select($"user_id", $"ts", $"ts_r", round($"value", 4).as("pv"),
        round($"view_value", 4).as("vv"))
      .orderBy("user_id", "ts", "ts_r").collect()
    assert(streamed.nonEmpty, "interval join produced no rows — fixture too sparse")
    assert(streamed.toSeq === batch.toSeq)
  }

  test("right-outer interval join null-extends unmatched right rows after left watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val lMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
    val rMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
    // right 10:05 matches left 10:00; right 12:00 is unmatched and must
    // surface null-extended once the LEFT watermark passes its interval.
    lMem.addData(Seq(EventRow(ts("2024-01-01 10:00:00"), 1L, "l", 1.0)))
    rMem.addData(Seq(
      EventRow(ts("2024-01-01 10:05:00"), 1L, "r", 10.0),
      EventRow(ts("2024-01-01 12:00:00"), 1L, "r", 20.0)))
    val left = lMem.toDF().select($"user_id", $"ts", $"value")
    val right = rMem.toDF().select($"user_id", $"ts", $"value".as("rv"))
    val q = graft.streaming.StreamOps
      .intervalJoin(left, right, "user_id", "ts", joinType = "right_outer")
      .writeStream.format("memory").queryName("roj").outputMode("append").start()
    q.processAllAvailable()
    lMem.addData(Seq(EventRow(ts("2024-01-03 00:00:00"), 9L, "l", 0.0)))
    rMem.addData(Seq(EventRow(ts("2024-01-03 00:00:00"), 8L, "r", 0.0)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("roj").filter($"user_id_r" === 1L)
      .select($"value", $"rv").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(got === Set(
      (Some(1.0), Some(10.0)), // matched pair
      (None, Some(20.0))))     // unmatched right, null-extended left
  }

  test("full-outer interval join emits both sides' unmatched rows after watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val lMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
    val rMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
    // left 10:00 matches right 10:05; left 11:00 unmatched; right 12:00
    // unmatched — full outer must surface BOTH null-extended rows once
    // the opposite watermark passes.
    lMem.addData(Seq(
      EventRow(ts("2024-01-01 10:00:00"), 1L, "l", 1.0),
      EventRow(ts("2024-01-01 11:00:00"), 1L, "l", 2.0)))
    rMem.addData(Seq(
      EventRow(ts("2024-01-01 10:05:00"), 1L, "r", 10.0),
      EventRow(ts("2024-01-01 12:00:00"), 1L, "r", 20.0)))
    val left = lMem.toDF().select($"user_id", $"ts", $"value")
    val right = rMem.toDF().select($"user_id", $"ts", $"value".as("rv"))
    val q = graft.streaming.StreamOps
      .intervalJoin(left, right, "user_id", "ts", joinType = "full_outer")
      .writeStream.format("memory").queryName("foj").outputMode("append").start()
    q.processAllAvailable()
    // push both watermarks far past every interval
    lMem.addData(Seq(EventRow(ts("2024-01-03 00:00:00"), 9L, "l", 0.0)))
    rMem.addData(Seq(EventRow(ts("2024-01-03 00:00:00"), 8L, "r", 0.0)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("foj").filter($"user_id" === 1L || $"user_id_r" === 1L)
      .select($"value", $"rv").collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toSet
    assert(got === Set(
      (Some(1.0), Some(10.0)), // matched pair
      (Some(2.0), None),       // unmatched left
      (None, Some(20.0))))     // unmatched right
  }

  test("a left column named after the ts_r/key_r rename target is rejected") {
    import spark.implicits._
    val ts0 = new java.sql.Timestamp(0L)
    // 'ts_r' on the LEFT would become ambiguous once the right's ts is
    // renamed to ts_r — the guard must catch it up front.
    val left = Seq((1L, ts0, 0.0)).toDF("user_id", "ts", "ts_r")
    val right = Seq((1L, ts0)).toDF("user_id", "ts")
    val e = intercept[IllegalArgumentException](
      graft.streaming.StreamOps.intervalJoin(left, right, "user_id", "ts"))
    assert(e.getMessage.contains("rename targets"))
  }
}

class SplitsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Splits

  test("splits are exhaustive, deterministic, and stable under repartitioning") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val s1 = Splits.assignSplit(docs, "doc_id", Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").orderBy("doc_id").collect().toSeq
    val s2 = Splits.assignSplit(docs.repartition(7), "doc_id",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").orderBy("doc_id").collect().toSeq
    assert(s1 === s2, "split must not depend on physical layout")
    val counts = s1.groupBy(_.getString(1)).view.mapValues(_.size).toMap
    assert(counts.keySet === Set("train", "valid", "test"))
    assert(counts("train") > counts("valid") && counts("train") > counts("test"))
  }

  test("growing a trailing split never moves rows between the leading ones") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Splits.assignSplit(docs, "doc_id", Seq("train" -> 0.8, "rest" -> 0.2))
      .filter($"split" === "train").select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Splits.assignSplit(docs, "doc_id", Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .filter($"split" === "train").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b, "re-slicing the tail must not churn the train set")
  }

  test("bad weights are rejected") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    intercept[IllegalArgumentException] {
      Splits.assignSplit(docs, "doc_id", Seq("train" -> 0.8, "test" -> 0.1))
    }
  }
}

/** Property: AsOf.joinLatest equals the brute-force per-probe maximum
  * search on arbitrary generated inputs. */
class AsOfPropertySpec extends SparkSpec {
  import org.scalacheck.{Gen, Prop, Test => SCTest}
  import spark.implicits._

  private val rowGen = for {
    key <- Gen.choose(1L, 3L)
    ts <- Gen.choose(0L, 40L)
    v <- Gen.choose(0, 1000).map(_ / 10.0)
  } yield (key, ts, v)

  test("joinLatest == brute-force latest-at-or-before, on random inputs") {
    val gen = for {
      refs <- Gen.listOfN(30, rowGen)
      probes <- Gen.listOfN(15, rowGen)
    } yield (refs, probes)
    val prop = Prop.forAll(gen) { case (refRows0, probeRows0) =>
      // unique seq ids keep the expected answer well-defined
      val refRows = refRows0.zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong, v) }
      val probeRows = probeRows0.zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong, v) }
      val refs = refRows.toDF("k", "t", "seq", "v")
      val probes = probeRows.toDF("k", "t", "seq", "v")
      val got = graft.operators.AsOf
        .joinLatest(probes, refs, Seq("k"), "t", "seq", "v")
        .select($"k", $"seq", $"asof_value")
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      probeRows.forall { case (k, t, seq, _) =>
        val expected = refRows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption.map(_._4)
        got((k, seq)) == expected
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("joinNext == brute-force earliest-at-or-after, on random inputs") {
    val gen = for {
      refs <- Gen.listOfN(30, rowGen)
      probes <- Gen.listOfN(15, rowGen)
    } yield (refs, probes)
    val prop = Prop.forAll(gen) { case (refRows0, probeRows0) =>
      val refRows = refRows0.zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong, v) }
      val probeRows = probeRows0.zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong, v) }
      val refs = refRows.toDF("k", "t", "seq", "v")
      val probes = probeRows.toDF("k", "t", "seq", "v")
      val got = graft.operators.AsOf
        .joinNext(probes, refs, Seq("k"), "t", "seq", "v")
        .select($"k", $"seq", $"asof_value")
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
      probeRows.forall { case (k, t, seq, _) =>
        // earliest ref at-or-after; equal-ts ties to the LOWEST seq
        val expected = refRows.filter(r => r._1 == k && r._2 >= t)
          .sortBy(r => (r._2, r._3)).headOption.map(_._4)
        got((k, seq)) == expected
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("joinNearest == brute-force nearest-with-prev-on-tie, on random inputs") {
    import org.apache.spark.sql.functions.timestamp_seconds
    val gen = for {
      refs <- Gen.listOfN(30, rowGen)
      probes <- Gen.listOfN(15, rowGen)
    } yield (refs, probes)
    val prop = Prop.forAll(gen) { case (refRows0, probeRows0) =>
      val refRows = refRows0.zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong, v) }
      val probeRows = probeRows0.zipWithIndex.map { case ((k, t, v), i) => (k, t, i.toLong, v) }
      val refs = refRows.toDF("k", "t", "seq", "v")
        .withColumn("ts", timestamp_seconds($"t"))
      val probes = probeRows.toDF("k", "t", "seq", "v")
        .withColumn("ts", timestamp_seconds($"t"))
      val got = graft.operators.AsOf
        .joinNearest(probes, refs, Seq("k"), "ts", "seq", "v")
        .select($"k", $"seq", $"nearest_side", $"nearest_value", $"nearest_delta_us")
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getString(2),
            if (r.isNullAt(3)) None else Some(r.getDouble(3)),
            if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
      probeRows.forall { case (k, t, seq, _) =>
        val prev = refRows.filter(r => r._1 == k && r._2 <= t)
          .sortBy(r => (r._2, r._3)).lastOption
        val next = refRows.filter(r => r._1 == k && r._2 >= t)
          .sortBy(r => (r._2, r._3)).headOption
        val expected = (prev, next) match {
          case (None, None) => ("none", None, None)
          case (Some(p), None) => ("prev", Some(p._4), Some((t - p._2) * 1000000L))
          case (None, Some(n)) => ("next", Some(n._4), Some((n._2 - t) * 1000000L))
          case (Some(p), Some(n)) =>
            if (t - p._2 <= n._2 - t) ("prev", Some(p._4), Some((t - p._2) * 1000000L))
            else ("next", Some(n._4), Some((n._2 - t) * 1000000L))
        }
        got((k, seq)) == expected
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }

  test("LabelProp one round == brute-force weighted majority, on random graphs") {
    val edgeGen = for {
      a <- Gen.choose(1L, 10L)
      b <- Gen.choose(1L, 10L) if a != b
      w <- Gen.choose(1L, 20L)
    } yield (math.min(a, b), math.max(a, b), w)
    val gen = Gen.listOfN(20, edgeGen)
      // one row per undirected pair: duplicates would double-count weight
      .map(_.groupBy(e => (e._1, e._2)).map(_._2.head).toList)
      .suchThat(_.nonEmpty)
    val prop = Prop.forAll(gen) { edges =>
      val df = edges.toDF("s", "d", "w")
      val got = graft.operators.LabelProp.run(df, "s", "d", "w", rounds = 1)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.forall { v =>
        val votes = edges.collect {
          case (a, b, w) if a == v => (b, w) // neighbor's round-0 label = its id
          case (a, b, w) if b == v => (a, w)
        }.groupBy(_._1).map { case (l, ws) => (l, ws.map(_._2).sum) }
        val expected = votes.toSeq.minBy { case (l, wt) => (-wt, l) }._1
        got(v) == expected
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }
}

/** A13's reason to exist: the hour-partitioned lake layout must let a
  * time-bounded read scan ONLY the matching directories. */
class PartitionPruningSpec extends SparkSpec {
  test("CDC zone read with year/month/day/hour predicate partition-prunes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdczone").toString + "/lake"
    val (valid, _) = graft.operators.Cdc.split(Queries.cdcFixture(spark, sf0001))
    val flat = graft.operators.Cdc.transform(valid, ingestionTs = Some($"_ingest_ts"))
    graft.operators.Cdc.writeCdcZone(flat, dir)
    val back = spark.read.json(dir)
    val q = back.filter($"year" === 2024 && $"month" === 1 && $"day" === 1 && $"hour" === 3)
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters section:\n$plan")
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*year[^\\]]*hour[^\\]]*\\].*"),
      s"year/hour not in PartitionFilters:\n$plan")
    // and the pruned read returns exactly the rows of that hour
    val expected = graft.operators.Cdc.withPartitionColumns(flat)
      .filter($"year" === 2024 && $"month" === 1 && $"day" === 1 && $"hour" === 3)
      .count()
    assert(q.count() === expected)
    assert(expected > 0, "fixture has no rows in the probed hour — pick another")
  }
}

/** The IVF scale path end to end: the assigned vector table WRITTEN
  * partitioned by cell, so a probe is a partition-pruned scan of ~1/K of
  * the corpus — the layout every Similarity scaladoc promises. */
class IvfLayoutSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.operators.Similarity
  import graft.sources.Tables

  test("cent_id-partitioned IVF table probes one cell via partition pruning") {
    val emb = Tables.embeddings(spark, sf0001)
    val cents = Similarity.collectCentroids(Similarity.kmeans(emb, k = 8, iterations = 1))
    val assigned = Similarity.assignToCentroidsLocal(emb, cents)
      .filter(col("vec_id") =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("ivf").toString + "/vectors"
    assigned.write.partitionBy("cent_id").parquet(dir)
    val stored = spark.read.parquet(dir)

    val query = emb.filter(col("vec_id") === 0).select(col("embedding").as("qe"))
    val got = Similarity.ivfTopK(stored, cents, query, k = 10,
      idCol = "vec_id", vecCol = "embedding", queryVecCol = "qe")
    val want = Similarity.ivfTopK(assigned, cents, query, k = 10,
      idCol = "vec_id", vecCol = "embedding", queryVecCol = "qe")
    assert(got.collect().map(_.toSeq).toSeq === want.collect().map(_.toSeq).toSeq,
      "partitioned-layout probe diverges from the in-memory probe")

    // the probed cell must reach the scan as a PartitionFilter (a dynamic
    // one via the broadcast join's DPP, or static after a literal filter)
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    val literalProbe = stored.filter(col("cent_id") === cents.head._1)
    val plan = literalProbe.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*cent_id[^\\]]*\\].*"),
      s"cent_id not in PartitionFilters:\n$plan")
  }
}

/** The training-corpus pipeline (quality -> exact dedup -> near-dup
  * clusters -> splits -> split-partitioned write) end to end. */
class TrainingPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("corpus has no exact dups, no near-dup pairs, total split assignment; layout prunes") {
    val dest = java.nio.file.Files.createTempDirectory("corpus").toString + "/out"
    val spec = Pipeline.TrainingSpec(
      sourcePath = s"$sf0001/documents.parquet", destPath = dest,
      nearDupJaccard = Some(0.8))
    Pipeline.plan(spark, spec).run()
    val back = spark.read.parquet(dest)

    // exact dups gone: one survivor per content hash
    val dupContent = back.groupBy(md5($"text".cast("binary"))).count().filter($"count" > 1).count()
    assert(dupContent === 0, "exact duplicates survived")
    // near-dups gone: re-running the detector on survivors finds nothing
    val residual = graft.operators.Dedup
      .jaccardPairs(back, "doc_id", "text", n = 3, threshold = 0.8).count()
    assert(residual === 0, "near-duplicate pairs survived")
    // survivor policy: every original doc's cluster minimum is present
    val pairs = graft.operators.Dedup.jaccardPairs(
      spark.read.parquet(s"$sf0001/documents.parquet"), "doc_id", "text", 3, 0.8)
    val clusterMins = graft.operators.Dedup.connectedComponents(pairs)
      .groupBy("label").agg(count(lit(1))).select($"label").collect().map(_.getLong(0)).toSet
    val kept = back.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clusterMins.subsetOf(kept), "a cluster's minimum id was dropped")
    // splits total + directory layout
    assert(back.filter(!$"split".isin("train", "valid", "test")).count() === 0)
    val dirs = new java.io.File(dest).listFiles().map(_.getName).filter(_.startsWith("split="))
    assert(dirs.toSet === Set("split=train", "split=valid", "split=test"))
  }

  test("useTxLog: same corpus as the plain writer; refresh is atomic per split") {
    import graft.operators.TxLog
    val destPlain = java.nio.file.Files.createTempDirectory("corpusp").toString + "/out"
    val destTx = java.nio.file.Files.createTempDirectory("corpust").toString + "/out"
    def spec(dest: String, tx: Boolean) = Pipeline.TrainingSpec(
      sourcePath = s"$sf0001/documents.parquet", destPath = dest,
      nearDupJaccard = Some(0.8), useTxLog = tx)
    Pipeline.plan(spark, spec(destPlain, tx = false)).run()
    val txPlan = Pipeline.plan(spark, spec(destTx, tx = true))
    txPlan.run()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(txPlan.readBack()) === rows(spark.read.parquet(destPlain)))

    // pin the pre-refresh train snapshot, then refresh the whole corpus:
    // the pinned snapshot must stay fully readable (immutable files) and
    // the head must advance atomically
    val trainZone = s"$destTx/split=train"
    val pinned = TxLog.latest(spark, trainZone).get
    val before = TxLog.readSnapshot(spark, trainZone, pinned).count()
    txPlan.run() // refresh
    assert(TxLog.readSnapshot(spark, trainZone, pinned).count() === before,
      "refresh disturbed a pinned reader's snapshot")
    assert(TxLog.latest(spark, trainZone).get.gen > pinned.gen)
    assert(rows(txPlan.readBack()) === rows(spark.read.parquet(destPlain)),
      "refresh changed the corpus content")
  }

  test("useTxLog: a split landing zero rows stays readable as a typed empty relation") {
    // 1 document -> exactly one populated split; the other two zones
    // publish zero files. readBack must union a TYPED empty relation from
    // the manifest's schema.ddl, not the zero-column frame a zero-file
    // snapshot reads as.
    val srcDir = java.nio.file.Files.createTempDirectory("corpus1").toString
    val dest = srcDir + "/out"
    spark.read.parquet(s"$sf0001/documents.parquet").limit(1)
      .write.parquet(srcDir + "/src")
    val plan = Pipeline.plan(spark, Pipeline.TrainingSpec(
      sourcePath = srcDir + "/src", destPath = dest,
      nearDupJaccard = None, useTxLog = true))
    plan.run()
    val back = plan.readBack()
    assert(back.count() === 1L)
    assert(back.columns.contains("split") && back.columns.contains("doc_id"))
    // the empty zones answer filtered queries with the right schema
    assert(back.filter($"split".isin("train", "valid", "test")).count() === 1L)
  }

  test("bad config fails at plan time, like CDK synth") {
    intercept[IllegalArgumentException] {
      Pipeline.plan(spark, Pipeline.TrainingSpec("src", "dst",
        splits = Seq("train" -> 0.5)))
    }
    intercept[IllegalArgumentException] {
      Pipeline.plan(spark, Pipeline.TrainingSpec("src", "dst", minQuality = 1.5))
    }
    intercept[IllegalArgumentException] {
      Pipeline.plan(spark, Pipeline.TrainingSpec("src", "dst",
        compactTargetBytes = Some(0L)))
    }
  }

  test("post-write compaction shrinks split files without changing the corpus") {
    val dest = java.nio.file.Files.createTempDirectory("corpusc").toString + "/out"
    def filesUnder(sub: String) =
      new java.io.File(s"$dest/$sub").listFiles()
        .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith(".")).length
    val base = Pipeline.TrainingSpec(
      sourcePath = s"$sf0001/documents.parquet", destPath = dest,
      nearDupJaccard = None)
    Pipeline.plan(spark, base).run()
    val uncompacted = filesUnder("split=train")
    val rows = spark.read.parquet(dest).count()

    Pipeline.plan(spark, base.copy(compactTargetBytes = Some(1L << 30))).run()
    assert(filesUnder("split=train") === 1,
      s"train split should compact to 1 file (was $uncompacted)")
    val back = spark.read.parquet(dest)
    assert(back.count() === rows, "compaction changed the corpus row count")
    assert(back.select("split").distinct().collect().map(_.getString(0)).toSet
      === Set("train", "valid", "test"))
  }
}

class OrcRoundTripSpec extends SparkSpec {
  test("full-load zone ORC round-trip preserves rows and schema") {
    val dir = java.nio.file.Files.createTempDirectory("orcload").toString + "/out"
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    graft.operators.FullLoad.run(src, dir, outputPartitions = 2, format = "orc")
    val back = graft.operators.FullLoad.readBack(spark, dir, format = "orc")
    assert(back.schema === src.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ===
      src.orderBy("n_nationkey").collect().toSeq)
    intercept[IllegalArgumentException] {
      graft.operators.FullLoad.run(src, dir, format = "avro") // not on the lake contract
    }
  }
}

/** Streaming session windows must survive a checkpoint restart without
  * losing or double-counting sessions (file source, like the CDC restart
  * test — MemoryStream offsets don't span restarts). */
class SessionRestartSpec extends SparkSpec {
  test("session_window agg across a restart == single batch result") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, sf0001)
      .select($"ts", $"user_id", $"value")
      .orderBy("ts").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
    val (first, second) = events.splitAt(events.length / 2)
    val src = java.nio.file.Files.createTempDirectory("sesssrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sessckpt").toString
    val out = java.nio.file.Files.createTempDirectory("sessout").toString + "/t"

    def writeBatch(rows: Seq[(java.sql.Timestamp, Long, Double)]): Unit =
      rows.toDF("ts", "user_id", "value").coalesce(1)
        .write.mode("append").json(src)

    def runOnce(): Unit = {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
      val stream = spark.readStream.schema(schema).json(src)
      val q = graft.streaming.StreamOps.sessionAgg(stream, "ts", "user_id", gap = "30 minutes")
        .writeStream.outputMode("complete")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("overwrite").parquet(out)
        }
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable(); q.stop()
    }
    writeBatch(first.toSeq); runOnce()
    writeBatch(second.toSeq); runOnce() // full restart from checkpoint
    val streamed = spark.read.parquet(out)
      .select(date_format($"session_start", "yyyy-MM-dd HH:mm:ss").as("start"),
        $"user_id".cast("long").as("user_id"), $"cnt")
      .orderBy("user_id", "start").collect()
    val batch = graft.sources.Tables.events(spark, sf0001)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("cnt"))
      .select(date_format($"session_window.start", "yyyy-MM-dd HH:mm:ss").as("start"),
        $"user_id".cast("long").as("user_id"), $"cnt")
      .orderBy("user_id", "start").collect()
    assert(streamed.toSeq === batch.toSeq)
  }
}

/** Property: Sessionize.assign equals a sequential fold over each key's
  * time-ordered events (new session when gap >= threshold). */
class SessionizePropertySpec extends SparkSpec {
  import org.scalacheck.{Gen, Prop, Test => SCTest}
  import spark.implicits._

  test("assign == sequential gap fold on random inputs") {
    val rowGen = for {
      key <- Gen.choose(1L, 3L)
      ts <- Gen.choose(0L, 500L)
    } yield (key, ts)
    val gen = Gen.listOfN(40, rowGen).map(_.zipWithIndex
      .map { case ((k, t), i) => (k, t, i.toLong) })
    val prop = Prop.forAll(gen) { rows =>
      rows.isEmpty || {
        val df = rows.map { case (k, t, seq) => (k, new java.sql.Timestamp(t * 1000L), seq) }
          .toDF("k", "ts", "seq")
        val got = graft.operators.Sessionize.assign(df, Seq("k"), "ts", "seq", gapSeconds = 60L)
          .select($"k", $"seq", $"session_id")
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        rows.groupBy(_._1).forall { case (k, ks) =>
          val ordered = ks.sortBy(r => (r._2, r._3))
          var sess = 0L; var prev = Long.MinValue
          ordered.forall { case (_, t, seq) =>
            if (prev == Long.MinValue || t - prev >= 60L) sess += 1
            prev = t
            got((k, seq)) == sess
          }
        }
      }
    }
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(result.passed, result.status.toString)
  }
}

class RedactSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.TextAnalysis

  test("masks mixed-case emails and digit runs; idempotent") {
    val df = Seq(
      "contact Bob@Corp.com or x9y at 555 1234",
      "no pii here",
      "a@b.co and 42").toDF("text")
    val once = df.select(TextAnalysis.redact($"text").as("r")).collect().map(_.getString(0))
    assert(once(0) === "contact <EMAIL> or x<NUM>y at <NUM> <NUM>")
    assert(once(1) === "no pii here")
    assert(once(2) === "<EMAIL> and <NUM>")
    val twice = df.select(TextAnalysis.redact(TextAnalysis.redact($"text")).as("r"))
      .collect().map(_.getString(0))
    assert(once.toSeq === twice.toSeq, "redaction must be idempotent")
  }

  test("local parts with ._%+- and hyphenated domains redact WHOLE, no partial leak") {
    val df = Seq(
      "mail john_doe@corp.com today",
      "or jane.d+tag@my-host.co.uk instead",
      "pct a%b@x.io end").toDF("text")
    val out = df.select(TextAnalysis.redact($"text").as("r")).collect().map(_.getString(0))
    assert(out(0) === "mail <EMAIL> today")   // not "john_<EMAIL>"
    assert(out(1) === "or <EMAIL> instead")
    assert(out(2) === "pct <EMAIL> end")
  }
}

/** Stream-static enrichment and the left-outer interval join's
  * watermark-gated null emission. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static dim enrichment == batch join") {
    implicit val sq = spark.sqlContext
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select($"ts", $"user_id", $"event_type", $"value").as[EventRow]
    val rows = ev.collect().toSeq
    val dim = Seq(("signup", 1.0), ("purchase", 5.0), ("view", 0.1),
      ("click", 0.2), ("error", 0.0)).toDF("etype", "weight")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
    mem.addData(rows)
    val q = graft.streaming.StreamOps.enrich(mem.toDF(), dim, "event_type", "etype")
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("enriched")
      .groupBy("event_type").agg(count(lit(1)).as("n"), max("weight").as("w"))
      .orderBy("event_type").collect()
    val batch = ev.toDF().join(dim, $"event_type" === $"etype")
      .groupBy("event_type").agg(count(lit(1)).as("n"), max("weight").as("w"))
      .orderBy("event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
  }

  test("left-outer interval join emits null rows once the watermark passes") {
    implicit val sq = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val lMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
    val rMem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
    // left row 10:00 matches right 10:05; left 11:00 has NO match.
    // The far-future rows on both sides push the watermark so the
    // unmatched 11:00 row's null output can actually be emitted.
    lMem.addData(Seq(
      EventRow(ts("2024-01-01 10:00:00"), 1L, "l", 1.0),
      EventRow(ts("2024-01-01 11:00:00"), 1L, "l", 2.0),
      EventRow(ts("2024-01-02 09:00:00"), 9L, "l", 0.0)))
    rMem.addData(Seq(
      EventRow(ts("2024-01-01 10:05:00"), 1L, "r", 10.0),
      EventRow(ts("2024-01-02 09:00:00"), 8L, "r", 0.0)))
    val left = lMem.toDF().select($"user_id", $"ts", $"value")
    val right = rMem.toDF().select($"user_id", $"ts", $"value".as("rv"))
    val q = graft.streaming.StreamOps
      .intervalJoin(left, right, "user_id", "ts", joinType = "left_outer")
      .writeStream.format("memory").queryName("loj").outputMode("append").start()
    q.processAllAvailable()
    // second micro-batch advances the watermark past 11:00's interval
    lMem.addData(Seq(EventRow(ts("2024-01-02 12:00:00"), 9L, "l", 0.0)))
    rMem.addData(Seq(EventRow(ts("2024-01-02 12:00:00"), 8L, "r", 0.0)))
    q.processAllAvailable(); q.stop()
    val got = spark.table("loj").filter($"user_id" === 1L)
      .select($"value", $"rv").orderBy("value").collect()
      .map(r => (r.getDouble(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq === Seq((1.0, Some(10.0)), (2.0, None)))
  }

  test("left-semi interval join == batch semi (each left row at most once)") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions.expr
    val ev = graft.sources.Tables.events(spark, sf0001)
      .select($"ts", $"user_id", $"event_type", $"value").as[EventRow]
    val rows = ev.collect().toSeq
    def mem() = {
      val m = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventRow]
      m.addData(rows); m
    }
    val purchases = mem().toDF().filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"value")
    val views = mem().toDF().filter($"event_type" === "view")
      .select($"user_id", $"ts", $"value".as("view_value"))
    val q = graft.streaming.StreamOps
      .intervalJoin(purchases, views, "user_id", "ts", joinType = "left_semi")
      .writeStream.format("memory").queryName("sij").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sij")
      .select($"user_id", $"ts", round($"value", 4).as("v"))
      .orderBy("user_id", "ts", "v").collect()

    val bp = ev.toDF().filter($"event_type" === "purchase").select($"user_id", $"ts", $"value")
    val bv = ev.toDF().filter($"event_type" === "view")
      .select($"user_id".as("user_id_r"), $"ts".as("ts_r"))
    val batch = bp.join(bv,
        $"user_id" === $"user_id_r" &&
          $"ts_r" >= $"ts" - expr("INTERVAL 10 minutes") &&
          $"ts_r" <= $"ts" + expr("INTERVAL 10 minutes"), "left_semi")
      .select($"user_id", $"ts", round($"value", 4).as("v"))
      .orderBy("user_id", "ts", "v").collect()
    assert(streamed.nonEmpty, "semi interval join produced no rows — fixture too sparse")
    assert(streamed.toSeq === batch.toSeq)
  }
}

/** Custom Expressions carry TWO implementations — interpreted eval() and
  * doGenCode() — and a divergence produces silently wrong results in
  * whichever path production happens to take. Pin them equal. */
class KernelPathEquivalenceSpec extends SparkSpec {
  import graft.operators.{Dedup, TextAnalysis}
  import graft.sources.Tables

  private def bothModes(build: => Array[org.apache.spark.sql.Row]): (Seq[org.apache.spark.sql.Row], Seq[org.apache.spark.sql.Row]) = {
    val ws = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val fm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = build.toSeq
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = build.toSeq
      (gen, interp)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
    }
  }

  test("FloatVecDot: generated == interpreted") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val (gen, interp) = bothModes {
      emb.crossJoin(broadcast(q))
        .select($"vec_id", round(graft.functions.VectorFunctions.dot($"embedding", $"qe"), 6))
        .orderBy("vec_id").collect()
    }
    assert(gen === interp)
  }

  test("MinHashSig: generated == interpreted") {
    import spark.implicits._
    val (gen, interp) = bothModes {
      Tables.documents(spark, sf0001)
        .select($"doc_id", TextAnalysis.tokens($"text").as("toks"))
        .select($"doc_id", TextAnalysis.shingles($"toks", 3).as("sh"))
        .select($"doc_id", Dedup.minhashSignature($"sh", 32).as("sig"))
        .orderBy("doc_id").collect()
    }
    assert(gen === interp)
  }

  test("SimHash32: generated == interpreted") {
    import spark.implicits._
    val (gen, interp) = bothModes {
      Tables.documents(spark, sf0001)
        .select($"doc_id", Dedup.simhash32(TextAnalysis.tokens($"text")).as("sh"))
        .orderBy("doc_id").collect()
    }
    assert(gen === interp)
  }

  test("ArgmaxCosine: generated == interpreted == literal formulation") {
    import spark.implicits._
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf0001)
    val cents = Similarity.collectCentroids(
      Similarity.kmeans(emb, k = 8, iterations = 1))
    val (gen, interp) = bothModes {
      Similarity.assignToCentroidsLocal(emb, cents)
        .select($"vec_id", $"cent_id").orderBy("vec_id").collect()
    }
    assert(gen === interp)
    // and both equal the literal array_max(struct(csim, -cid, cid))
    // formulation the kernel replaced — same arithmetic bit-for-bit
    import graft.functions.VectorFunctions.{dot, normSq}
    val vnorm = sqrt(normSq($"embedding"))
    val scored = cents.map { case (cid, ce) =>
      var sq = 0.0
      ce.foreach(x => sq += x.toDouble * x.toDouble)
      val denom = vnorm * lit(math.sqrt(sq))
      val csim = when(denom === 0.0, lit(0.0))
        .otherwise(dot($"embedding", typedLit(ce)) / denom)
      struct(csim.as("s"), lit(-cid).as("negid"), lit(cid).as("cid"))
    }
    val literal = emb.select($"vec_id",
        when($"embedding".isNotNull, array_max(array(scored: _*)).getField("cid"))
          .as("cent_id"))
      .orderBy("vec_id").collect().toSeq
    assert(gen === literal)
  }

  test("ArgmaxCosine: content-equal instances are equal (canonicalization/reuse)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import graft.functions.ArgmaxCosine
    val child = BoundReference(0, ArrayType(FloatType), nullable = true)
    def mk() = ArgmaxCosine(child, Array((0L, Array(1.0f, 2.0f)), (1L, Array(3.0f, 4.0f))))
    // separately-constructed Arrays: the case-class default would compare
    // by reference, break semanticEquals, and defeat subexpression
    // elimination / plan-level reuse
    assert(mk() === mk())
    assert(mk().hashCode() === mk().hashCode())
    assert(mk().semanticEquals(mk()))
    val different = ArgmaxCosine(child, Array((0L, Array(1.0f, 2.0f)), (1L, Array(3.0f, 5.0f))))
    assert(mk() !== different)
  }

  test("ArgmaxCosine: null embedding yields null assignment") {
    import spark.implicits._
    import graft.operators.Similarity
    val df = Seq(
      (1L, Some(Seq(1.0f, 0.0f))), (2L, None)
    ).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val got = Similarity.assignToCentroidsLocal(
        df, Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f))))
      .select("vec_id", "cent_id").orderBy("vec_id").collect()
    assert(got(0).getLong(1) == 0L)
    assert(got(1).isNullAt(1), "null embedding must yield null cent_id")
  }

  test("PqEncode: generated == interpreted == literal formulation") {
    import spark.implicits._
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf0001)
    val m = 8
    val seeds = Similarity.pqSeeds(emb.filter($"vec_id" >= 5), 16)
    val (gen, interp) = bothModes {
      emb.select($"vec_id", Similarity.pqEncode($"embedding", seeds, m).as("codes"))
        .orderBy("vec_id").collect()
    }
    assert(gen === interp)
    // and both equal the literal array_min(array(struct(dist, j)))
    // formulation the kernel replaced (round 16) — same arithmetic
    // bit-for-bit: left-associated double fold over exactly-widened
    // floats, struct-min tie to the lowest code index
    val dim = seeds.head.length
    val dsub = dim / m
    val literalCodes = array((0 until m).map { s =>
      array_min(array(seeds.zipWithIndex.map { case (seed, j) =>
        val dist = (0 until dsub).map { i =>
          val diff = element_at($"embedding", s * dsub + i + 1).cast("double") -
            lit(seed(s * dsub + i).toDouble)
          diff * diff
        }.reduce(_ + _)
        struct(dist.as("d"), lit(j).as("j"))
      }: _*)).getField("j")
    }: _*)
    val literal = emb.select($"vec_id", literalCodes.as("codes"))
      .orderBy("vec_id").collect().toSeq
    assert(gen === literal)
  }

  test("PqEncode: null vector encodes to zero codes, like the literal form") {
    import spark.implicits._
    import graft.operators.Similarity
    val df = Seq(
      (1L, Some(Seq(0.9f, 0.1f, 0.2f, 0.8f))), (2L, None)
    ).toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val seeds = Seq(Array(0.0f, 0.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f, 1.0f))
    val got = Similarity.pqEncode($"embedding", seeds, 2)
    val rows = df.select($"vec_id", got.as("codes")).orderBy("vec_id").collect()
    assert(rows(0).getSeq[Int](1) === Seq(1, 1))
    // the literal form's null-vector result: all distances null -> struct
    // tie -> lowest j per subspace, never a null array
    assert(rows(1).getSeq[Int](1) === Seq(0, 0))
  }

  test("PqEncode: content-equal instances are equal (canonicalization/reuse)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import graft.functions.PqEncode
    val child = BoundReference(0, ArrayType(FloatType), nullable = true)
    def mk() = PqEncode(child, Array(Array(1.0f, 2.0f), Array(3.0f, 4.0f)), 2)
    assert(mk() === mk())
    assert(mk().hashCode() === mk().hashCode())
    assert(mk().semanticEquals(mk()))
    val different = PqEncode(child, Array(Array(1.0f, 2.0f), Array(3.0f, 5.0f)), 2)
    assert(mk() !== different)
  }
}

/** SQL null semantics for the custom kernels: null input -> null output,
  * never an NPE or a garbage value. */
class KernelNullSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.VectorFunctions

  test("FloatVecDot: null on either side yields null") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (None, Some(Array(3f, 4f))),
      (Some(Array(1f, 2f)), None)).toDF("a", "b")
    val out = df.select(VectorFunctions.dot($"a", $"b")).collect()
    assert(out(0).getDouble(0) === 11.0)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }

  test("MinHashSig / SimHash32: null token array yields null") {
    val df = Seq(Some(Seq("a b c", "b c d")), None).toDF("sh")
    val sig = df.select(graft.operators.Dedup.minhashSignature($"sh", 8)).collect()
    assert(!sig(0).isNullAt(0))
    assert(sig(1).isNullAt(0))
    val toks = Seq(Some(Seq("x", "y")), None).toDF("t")
    val sh = toks.select(graft.operators.Dedup.simhash32($"t")).collect()
    assert(!sh(0).isNullAt(0))
    assert(sh(1).isNullAt(0))
  }

  test("both centroid-assignment paths: null embedding yields null cent_id, not centroid 0") {
    val vecs = Seq((1L, Some(Array(1f, 0f))), (2L, None))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(0f, 1f)), (5L, Array(1f, 0f)))
    val local = graft.operators.Similarity
      .assignToCentroidsLocal(vecs, cents)
      .orderBy($"vec_id").collect()
    assert(local(0).getLong(1) === 5L)
    assert(local(1).isNullAt(1), "local: null embedding must not be assigned to the lowest cid")
    val centsDf = cents.toDF("cent_id", "ce")
    val dist = graft.operators.Similarity
      .assignToCentroids(vecs, centsDf)
      .orderBy($"vec_id").collect()
    assert(dist(0).getLong(1) === 5L)
    assert(dist(1).isNullAt(1), "distributed: null embedding must not be assigned to the lowest cid")
  }
}

/** Lake operational robustness: schema evolution and corrupt-file
  * tolerance — the two failure modes an append-only lake actually hits. */
class LakeRobustnessSpec extends SparkSpec {
  import spark.implicits._

  test("schema-evolved parquet reads as the union schema with nulls for old rows") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v1").write.mode("append").parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "v1", "v2"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("v2")), "pre-evolution row must read null v2")
    assert(rows(1).getDouble(rows(1).fieldIndex("v2")) === 9.5)
  }

  test("a corrupt file in the scan path is skippable without losing good files") {
    val dir = java.nio.file.Files.createTempDirectory("corrupt").toString + "/t"
    Seq((1L, "ok")).toDF("id", "v").write.mode("append").parquet(dir)
    // plant garbage that claims to be parquet
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-corrupt.snappy.parquet"),
      "not a parquet file".getBytes)
    val prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    try {
      // default: the corrupt file fails the query loudly (no silent loss)
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
      intercept[org.apache.spark.SparkException] {
        spark.read.parquet(dir).count()
      }
      // opt-in degraded mode: good files still read
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      assert(spark.read.parquet(dir).count() === 1L)
    } finally spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)
  }
}

class KMeansEdgeSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Similarity

  test("k larger than the corpus yields one centroid per vector") {
    val df = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val cents = Similarity.kmeans(df, k = 5, iterations = 2)
    assert(cents.count() === 2)
  }

  test("custom column names are honored end to end") {
    val df = Seq((0L, Array(1f, 0f)), (1L, Array(0f, 1f)), (2L, Array(1f, 1f)))
      .toDF("id", "vec")
    val cents = Similarity.kmeans(df, k = 2, iterations = 2, idCol = "id", vecCol = "vec")
    assert(cents.count() === 2)
    assert(cents.columns.toSeq === Seq("cent_id", "ce"))
  }
}

/** The banded-LSH near-dup blocking (q43's scale path): its output must
  * be a SUBSET of the exact all-pairs result (false positives are always
  * cosine-verified away; banding only costs recall, never precision),
  * and the plan must self-join on a scalar band key. */
class LshBandedSpec extends SparkSpec {
  import graft.operators.Similarity
  import graft.sources.Tables

  test("banded pairs are a verified subset of the exact all-pairs result") {
    val emb = Tables.embeddings(spark, sf0001)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = pairs(Similarity.cosineNearDupPairs(emb, 0.30)
      .select("a_id", "b_id", "sim"))
    val banded = pairs(Similarity.lshBandedNearDupPairs(emb, 0.30, dim = 64)
      .select("a_id", "b_id", "sim"))
    assert(banded.nonEmpty, "fixture produced no banded pairs — threshold too high")
    assert(banded.subsetOf(exact),
      s"banding produced pairs the exact form lacks: ${banded -- exact}")
    // recall is probabilistic (documented); just surface it
    info(f"banded recall at 0.30: ${banded.size}/${exact.size}")
  }

  test("identical vectors always land in the same bucket (recall floor)") {
    import spark.implicits._
    val df = Seq((0L, Array(1f, 2f, 3f, 4f)), (1L, Array(1f, 2f, 3f, 4f)),
      (2L, Array(-1f, -2f, -3f, -4f))).toDF("vec_id", "embedding")
    val got = Similarity.lshBandedNearDupPairs(df, 0.99, dim = 4)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((0L, 1L)))
  }

  test("multi-probe output = EXACTLY the pairs with some band within Hamming 2, each once") {
    // the multi-probe contract, checked against a brute-force all-pairs
    // reference computed with the SAME bucket/cosine expressions: a pair
    // is emitted iff cosine passes AND some band of the two bucket words
    // is within Hamming 2 (the ball-1 probe sets intersect), and the
    // witness-key discipline emits it exactly once — no distinct anywhere
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val nBits = 8; val bands = 2; val bandBits = nBits / bands
    val vecs = (0 until 150).map { i =>
      (i.toLong, Array.tabulate(8)(d =>
        (math.sin(i * 0.37 + d * 1.3) + 0.2 * ((i + d) % 5)).toFloat))
    }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val withB = vecs.select($"vec_id", $"embedding",
      Similarity.hyperplaneBucket($"embedding", dim = 8, nBits = nBits).as("bkt"))
    def ham(bp: Int) = bit_count(
      shiftright(col("a.bkt"), bp * bandBits).bitwiseAND(lit((1L << bandBits) - 1))
        .bitwiseXOR(shiftright(col("b.bkt"), bp * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1))))
    val expected = withB.as("a").join(withB.as("b"),
        col("a.vec_id") < col("b.vec_id") &&
          ((ham(0) <= 2) || (ham(1) <= 2)))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        round(graft.functions.VectorFunctions.cosine(
          col("a.embedding"), col("b.embedding")), 4).as("sim"))
      .filter($"sim" >= 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val gotRows = Similarity.lshBandedNearDupPairsMultiProbe(vecs, 0.3,
        dim = 8, nBits = nBits, bands = bands)
      .as[(Long, Long, Double)].collect()
    assert(gotRows.length === gotRows.toSet.size,
      "the witness-key discipline must emit each pair exactly once")
    assert(gotRows.toSet === expected,
      "multi-probe must recover exactly the Hamming<=2-band pairs")
    // and it strictly dominates the base tier on this corpus
    val base = Similarity.lshBandedNearDupPairs(vecs, 0.3,
      dim = 8, nBits = nBits, bands = bands)
      .as[(Long, Long, Double)].collect().toSet
    assert(base.subsetOf(gotRows.toSet),
      "multi-probe output must be a superset of the base banded tier")
  }

  // round-13 directive #2: the base-vs-multi-probe choice derives from
  // the corpus. STRUCTURED fixture = near-dup mass at moderate cosine
  // (planted companions at ~0.6 — where plantstats measured base recall
  // collapse); NEAR-ORTHOGONAL fixture = the only true pairs are exact
  // duplicates (cosine 1.0, bands always agree). The auto default must
  // pick multi-probe on the first and base on the second, and its output
  // must be bit-identical to the tier it picked.
  test("auto tier picks multi-probe on a structured corpus, base on a near-orthogonal one") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val threshold = 0.45
    def toDf(rows: Seq[(Long, Array[Float])]) =
      rows.toDF("vec_id", "embedding")
        .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.as[(Long, Long, Double)].collect().toSet

    // structured: 200 deterministic seeds + a companion at cosine ~0.6
    // each (the plantstats construction: v' = cosθ·v̂ + sinθ·û, û a
    // deterministic Gram-Schmidt'd companion direction)
    val theta = math.acos(0.6)
    val seeds = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(64)(d =>
        (math.sin(i * 0.37 + d * 1.3) + 0.2 * ((i + d) % 5)).toFloat))
    }
    val planted = seeds.flatMap { case (id, v) =>
      val vd = v.map(_.toDouble)
      val nv = math.sqrt(vd.map(x => x * x).sum)
      val vh = vd.map(_ / nv)
      val u0 = Array.tabulate(vd.length)(i =>
        vh((i + 1) % vd.length) * (if (i % 2 == 0) 1.0 else -1.0))
      val proj = u0.zip(vh).map { case (a, b) => a * b }.sum
      val ur = u0.zip(vh).map { case (a, b) => a - proj * b }
      val un = math.sqrt(ur.map(x => x * x).sum)
      if (un < 1e-9) None
      else Some((id + 100000L, Array.tabulate(vd.length)(i =>
        ((math.cos(theta) * vh(i) + math.sin(theta) * ur(i) / un) * nv).toFloat)))
    }
    val structured = toDf(seeds ++ planted)
    val nBits = 32; val bands = 4 // adaptiveBandBits(400) = 8 per band
    val (estS, pairsS) = Similarity.estimateBandedRecall(structured, threshold,
      dim = 64, nBits = nBits, bands = bands)
    assert(pairsS > 0, "structured fixture must contain sample pairs")
    assert(estS < 0.8,
      f"structured corpus must estimate low base recall, got $estS%.3f")
    val autoS = pairSet(Similarity.lshBandedNearDupPairsAuto(structured,
      threshold, dim = 64, nBits = nBits, bands = bands))
    val mp = pairSet(Similarity.lshBandedNearDupPairsMultiProbe(structured,
      threshold, dim = 64, nBits = nBits, bands = bands))
    val baseS = pairSet(Similarity.lshBandedNearDupPairs(structured,
      threshold, dim = 64, nBits = nBits, bands = bands))
    assert(autoS === mp, "auto must dispatch to the multi-probe tier here")
    // and the choice matters: multi-probe really recovers planted pairs
    // the base tier loses on this corpus
    def plantedRecovered(s: Set[(Long, Long, Double)]) =
      s.count { case (a, b, _) => b === a + 100000L }
    assert(plantedRecovered(mp) > plantedRecovered(baseS),
      s"fixture must separate the tiers: mp=${plantedRecovered(mp)} " +
        s"base=${plantedRecovered(baseS)}")

    // near-orthogonal: 64 exact one-hot axes + an exact duplicate each —
    // every true pair is at cosine 1.0, cross pairs exactly 0
    val ortho = toDf((0 until 64).flatMap { i =>
      val v = Array.tabulate(64)(d => if (d == i) 1.0f else 0.0f)
      Seq((i.toLong, v), (i.toLong + 100000L, v))
    })
    val (estO, pairsO) = Similarity.estimateBandedRecall(ortho, threshold,
      dim = 64, nBits = nBits, bands = bands)
    assert(pairsO > 0, "orthogonal fixture must contain its duplicate pairs")
    assert(estO >= 0.8,
      f"exact-dup-only corpus must estimate high base recall, got $estO%.3f")
    val autoO = pairSet(Similarity.lshBandedNearDupPairsAuto(ortho,
      threshold, dim = 64, nBits = nBits, bands = bands))
    val baseO = pairSet(Similarity.lshBandedNearDupPairs(ortho,
      threshold, dim = 64, nBits = nBits, bands = bands))
    assert(autoO === baseO, "auto must dispatch to the base tier here")
  }

  test("zone-memoized recall estimate: a repeated call over an unchanged zone reads zero data files") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.operators.TxLog
    val zone = java.nio.file.Files
      .createTempDirectory("graft_brmemo").toString + "/emb"
    def rows(ids: Range) = ids.flatMap { i =>
      val v = Array.tabulate(64)(d => if (d == i % 64) 1.0f else 0.0f)
      Seq((i.toLong, v), (i.toLong + 100000L, v))
    }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    TxLog.replace(spark, zone, rows(0 until 16))
    val first = Similarity.estimateBandedRecallZone(spark, zone, 0.45,
      dim = 64, nBits = 32, bands = 4)
    assert(first._2 > 0, "fixture must contain sample pairs")

    // hide every committed data file: any read would crash, so a passing
    // repeat PROVES the memo path is metadata-only (the ann.health
    // discipline applied to the auto tier's probe)
    val head = TxLog.latest(spark, zone).get
    val dir = new java.io.File(zone)
    val moved = head.files.map { f =>
      val src = new java.io.File(dir, f)
      val dst = new java.io.File(dir, f + ".hidden")
      assert(src.isFile && src.renameTo(dst), s"could not hide $src")
      (dst, src)
    }
    try {
      val memo = Similarity.estimateBandedRecallZone(spark, zone, 0.45,
        dim = 64, nBits = 32, bands = 4)
      assert(memo === first, "the memoized estimate must equal the measured one")
    } finally moved.foreach { case (dst, src) => dst.renameTo(src) }

    // a DIFFERENT operating point misses (per-params memo) ...
    val otherT = Similarity.estimateBandedRecallZone(spark, zone, 0.99,
      dim = 64, nBits = 32, bands = 4)
    assert(otherT._2 <= first._2)
    // ... and both points now COEXIST (round-15 ADVICE: the slots are
    // namespaced by operating point, so alternating callers hit the memo
    // and never publish another generation — no log growth, no thrash)
    val genBefore = TxLog.latest(spark, zone).get.gen
    assert(Similarity.estimateBandedRecallZone(spark, zone, 0.45,
      dim = 64, nBits = 32, bands = 4) === first)
    assert(Similarity.estimateBandedRecallZone(spark, zone, 0.99,
      dim = 64, nBits = 32, bands = 4) === otherT)
    assert(TxLog.latest(spark, zone).get.gen === genBefore,
      "alternating memoized operating points must not commit new generations")
    // ... and new data invalidates: an append changes the file set
    TxLog.append(spark, zone, rows(16 until 32))
    val after = Similarity.estimateBandedRecallZone(spark, zone, 0.45,
      dim = 64, nBits = 32, bands = 4)
    assert(after._2 >= first._2,
      s"a grown zone must re-measure (more sample pairs), got $after vs $first")

    // the zone front door dispatches from the memo and matches the
    // in-memory auto tier bit-for-bit on the same corpus
    val viaZone = Similarity.lshBandedNearDupPairsAutoZone(spark, zone, 0.45,
      dim = 64, nBits = 32, bands = 4)
      .as[(Long, Long, Double)].collect().toSet
    val viaDf = Similarity.lshBandedNearDupPairsAuto(TxLog.read(spark, zone),
      0.45, dim = 64, nBits = 32, bands = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaZone === viaDf)
  }
}

class SessionizeCompositeKeySpec extends SparkSpec {
  import spark.implicits._

  test("composite keys sessionize independently per key tuple") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val df = Seq(
      (1L, "a", ts(0), 1L), (1L, "a", ts(10), 2L),
      (1L, "b", ts(5), 3L),          // same user, different device: own session
      (2L, "a", ts(0), 4L))
      .toDF("user_id", "device", "ts", "event_id")
    val out = graft.operators.Sessionize
      .assign(df, Seq("user_id", "device"), "ts", "event_id", gapSeconds = 60L)
      .select("user_id", "device", "event_id", "session_id")
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, "a", 1L, 1L), (1L, "a", 2L, 1L), (1L, "b", 3L, 1L), (2L, "a", 4L, 1L)))
    // and a gap within one composite key opens session 2 only there
    val out2 = graft.operators.Sessionize
      .assign(df.union(Seq((1L, "a", ts(500), 5L)).toDF("user_id", "device", "ts", "event_id")),
        Seq("user_id", "device"), "ts", "event_id", gapSeconds = 60L)
      .filter($"event_id" === 5L).select("session_id").collect()
    assert(out2.head.getLong(0) === 2L)
  }
}

/** Error-zone replay: previously-errored rows re-ingested under current
  * rules — recoverable rows recover, the rest stay errored, nothing lost. */
class ReplayErrorsSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Cdc

  private def envOf(lines: Seq[String]) = Cdc.parse(lines.toDF("value"))

  test("rule extension recovers unknown-event rows; corrupt lines stay errored") {
    val good = """{"eventName":"INSERT","dynamodb":{"ApproximateCreationDateTime":1.0,"NewImage":{"id":{"S":"1"},"name":{"S":"a"}}}}"""
    val upsert = good.replace("INSERT", "UPSERT") // not valid... yet
    val garbage = "{not json"
    val (_, errors) = Cdc.split(envOf(Seq(good, upsert, garbage)))
    assert(errors.count() === 2)

    // replay under the ORIGINAL rules: nothing recovers, nothing is lost
    val (rec0, bad0) = Cdc.replayErrors(errors)
    assert(rec0.count() === 0 && bad0.count() === 2)

    // replay after the rules learn UPSERT: that row recovers with its
    // payload intact; the garbage stays errored with a fresh reason
    val (rec1, bad1) = Cdc.replayErrors(errors, Cdc.ValidEvents :+ "UPSERT")
    assert(rec1.count() === 1)
    assert(rec1.select("eventName").head().getString(0) === "UPSERT")
    assert(bad1.count() === 1)
    assert(bad1.select("error_reason").head().getString(0) === "corrupt_record")
  }

  test("a corrupt line becomes recoverable once it parses (raw text preserved)") {
    // a line that is VALID json — errored only for its unknown event name
    val odd = """{"eventName":"PATCH","dynamodb":{"ApproximateCreationDateTime":2.0,"NewImage":{"id":{"S":"9"},"name":{"S":"z"}}}}"""
    val (_, errors) = Cdc.split(envOf(Seq(odd)))
    val (rec, bad) = Cdc.replayErrors(errors, validEvents = Seq("INSERT", "MODIFY", "REMOVE", "PATCH"))
    assert(rec.count() === 1 && bad.count() === 0)
    // the recovered envelope still carries its image
    val img = rec.select("dynamodb.NewImage").head().getMap[String, Map[String, String]](0)
    assert(img("id")("S") === "9")
  }
}
