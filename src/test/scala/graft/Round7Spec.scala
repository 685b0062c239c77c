package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import graft.operators.{KCore, LabelProp}

/** Round-7 additions: graph-loop early exit (the round budget must be a
  * CAP, not a cost, on an already-converged graph) and the q73 plan pin
  * from the bench-outlier forensics. */
class Round7Spec extends SparkSpec {
  import spark.implicits._

  /** Jobs started while `body` runs. The listener bus is asynchronous, so
    * after the (synchronous) body returns we wait for the count to stop
    * moving rather than sleeping a fixed, racy interval. */
  private def countJobs(body: => Unit): Int = {
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var prev = -1
      var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val c = counter.get
        if (c == prev) stable += 1 else { stable = 0; prev = c }
      }
      counter.get
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("k-core peeling exits early on an already-converged graph") {
    // K6: every node has degree 5 >= k, so round 1 removes nothing and
    // the loop must stop — any budget past 2 costs exactly what 2 does
    // (the last budgeted round runs uninstrumented, so the comparison
    // pair must both stop EARLY, i.e. before their final round).
    val edges = (for { a <- 1 to 6; b <- (a + 1) to 6 } yield (a.toLong, b.toLong))
      .toDF("src", "dst")
    def run(rounds: Int) = KCore.peel(edges, "src", "dst", k = 2, rounds = rounds)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val r1 = run(1)
    assert(r1 === (1 to 6).map(n => (n.toLong, 5L)), s"K6 2-core wrong: $r1")
    assert(run(8) === r1)
    val j2 = countJobs { run(2) }
    val j8 = countJobs { run(8) }
    assert(j8 === j2,
      s"8-round budget on a converged graph ran extra jobs: $j8 vs $j2")
  }

  test("k-core early exit never fires while a cascade is still peeling") {
    // Path 1-2-3-4-5 with k=2: endpoints peel first, the cascade then eats
    // the whole path over ~2 more rounds — early exit must not cut it short
    // (the result must equal the generous-budget run, here the empty core).
    val path = (1 to 4).map(i => (i.toLong, (i + 1).toLong)).toDF("src", "dst")
    val out = KCore.peel(path, "src", "dst", k = 2, rounds = 10).collect()
    assert(out.isEmpty, s"a path has no 2-core, got ${out.toSeq}")
  }

  test("label propagation exits early at a fixpoint") {
    // Equal-weight triangle: labels go (2,1,1) -> (1,1,1) -> unchanged, a
    // true fixpoint detected at round 3 — any budget past 4 runs exactly
    // rounds 1-3 and stops, so a 4-round and a 10-round budget must cost
    // the same jobs (both stop before their uninstrumented final round).
    val tri = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L)).toDF("src", "dst", "w")
    def run(rounds: Int) = LabelProp.run(tri, "src", "dst", "w", rounds)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(10) === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
    assert(run(4) === run(10))
    val j4 = countJobs { run(4) }
    val j10 = countJobs { run(10) }
    assert(j10 === j4,
      s"10-round budget past the fixpoint ran extra jobs: $j10 vs $j4")
  }

  test("label propagation early exit does not misread a 2-cycle as converged") {
    // Single edge: the two labels legitimately swap every round (bipartite
    // oscillation) — never a fixpoint, so round counts must track the
    // budget, and parity decides the labels.
    val e = Seq((1L, 2L, 1L)).toDF("src", "dst", "w")
    def run(rounds: Int) = LabelProp.run(e, "src", "dst", "w", rounds)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(run(1) === Seq((1L, 2L), (2L, 1L)), "odd rounds swap")
    assert(run(2) === Seq((1L, 1L), (2L, 2L)), "even rounds swap back")
  }

  test("int8 quantization: codes bounded, endpoints pinned, reconstruction within half a step") {
    import graft.operators.Similarity
    // two dims with different ranges + one degenerate dim (mx == mn)
    val vecs = Seq(
      (1L, Array(-2.0f, 10.0f, 3.0f)),
      (2L, Array(0.5f, 40.0f, 3.0f)),
      (3L, Array(4.0f, 25.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val (mins, maxs) = Similarity.dimMinMax(vecs)
    assert(mins.toSeq === Seq(-2.0, 10.0, 3.0) && maxs.toSeq === Seq(4.0, 40.0, 3.0))
    val coded = vecs.select(col("vec_id"), col("embedding"),
        Similarity.quantizeInt8(col("embedding"), mins, maxs).as("code"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray, r.getSeq[Int](2).toArray)).sortBy(_._1)
    for ((_, v, c) <- coded; i <- v.indices) {
      assert(c(i) >= -128 && c(i) <= 127, s"code out of int8 range: ${c(i)}")
      val (mn, mx) = (mins(i), maxs(i))
      if (mx == mn) assert(c(i) === 0, "degenerate dimension must code to 0")
      else {
        // dequantized value is within half a quantization step
        val step = (mx - mn) / 255.0
        val deq = mn + (c(i) + 128) * step
        assert(math.abs(deq - v(i)) <= step / 2 + 1e-9,
          s"dim $i: $deq vs ${v(i)} (step $step)")
      }
    }
    // endpoints: the corpus min codes to -128, the max to 127
    assert(coded(0)._3(0) === -128 && coded(2)._3(0) === 127)
    assert(coded(0)._3(1) === -128 && coded(1)._3(1) === 127)
    // int8Dot is the exact integer dot of the codes
    val d12 = vecs.filter($"vec_id" === 1L).select(
        Similarity.quantizeInt8(col("embedding"), mins, maxs).as("a"))
      .crossJoin(vecs.filter($"vec_id" === 2L).select(
        Similarity.quantizeInt8(col("embedding"), mins, maxs).as("b")))
      .select(Similarity.int8Dot(col("a"), col("b"))).head().getLong(0)
    val (c1, c2) = (coded(0)._3, coded(1)._3)
    assert(d12 === c1.zip(c2).map { case (x, y) => x.toLong * y }.sum)
  }

  test("q73 plans as a pure broadcast chain (the bench-outlier pin)") {
    // Round-6 forensics: q73's 2.7 s bench entry was the regenerated
    // testdata + inventory interference, not a plan regression — a
    // same-machine A/B ran the round-5 code SLOWER (2.00 s vs 1.39 s)
    // on the current data. This pins the intended shape so a future
    // regression is a test failure, not a bench mystery: the fact
    // (lineitem) must stream through broadcast joins only.
    spark.conf.set("spark.sql.maxMetadataStringLength", "4000")
    val p = Queries.queryMap("q73_tpch_q5")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact must not shuffle-join:\n$p")
    assert(!p.contains("ShuffledHashJoin"), s"fact must not shuffle-join:\n$p")
  }
}
