package graft

import org.apache.spark.sql.functions._
import graft.operators.{Layout, Sketch}
import graft.sources.Tables

/** Sketch + layout operators: HLL accuracy vs exact, bloom's no-false-
  * negative guarantee and bounded false-positive rate, z-value arithmetic
  * vs a bit-twiddling reference, and the clustered layout's disjoint
  * z-ranges. The cross-engine agreement of the same operators is pinned by
  * q131–q133's DuckDB oracles; these specs pin the SEMANTIC guarantees no
  * row-hash can express. */
class SketchSpec extends SparkSpec {

  test("hll estimate within the m=64 error regime of exact distinct") {
    val li = Tables.lineitem(spark, sf0001)
    val est = Sketch.hllEstimate(li, "l_partkey", Seq.empty)
      .collect().head.getDouble(0)
    val exact = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    // rsd for m=64 is 1.04/sqrt(64) = 13%; 3 sigma ~ 40%
    assert(exact > 0)
    val rel = math.abs(est - exact) / exact
    assert(rel < 0.4, s"hll est $est vs exact $exact (rel err $rel)")
  }

  test("hll registers: bucket in [0,64), rho in [1,27]") {
    val regs = Sketch.hllRegisters(Tables.lineitem(spark, sf0001), "l_partkey", Seq.empty)
      .collect()
    assert(regs.nonEmpty && regs.length <= 64)
    regs.foreach { r =>
      val (b, m) = (r.getLong(0), r.getLong(1))
      assert(b >= 0 && b < 64, s"bucket $b out of range")
      assert(m >= 1 && m <= 27, s"register $m out of range")
    }
  }

  // build set keyed on s_suppkey, not s_acctbal: sf0.001 happens to have
  // zero negative-balance suppliers, and the spec needs a non-empty build
  test("bloom: every true member passes the probe (no false negatives)") {
    val supp = Tables.supplier(spark, sf0001)
    val bad = supp.filter(col("s_suppkey") % 3 === 0).select("s_suppkey")
    val mask = Sketch.bloomBuild(bad, "s_suppkey", 2048, 3)
    val missed = bad.filter(!Sketch.bloomProbe(col("s_suppkey"), mask, 2048, 3)).count()
    assert(missed == 0L, s"$missed build-side keys failed their own probe")
  }

  test("bloom: false positive rate bounded on non-members") {
    val supp = Tables.supplier(spark, sf0001)
    val bad = supp.filter(col("s_suppkey") % 3 === 0).select("s_suppkey")
    val nBad = bad.count()
    assert(nBad > 0, "fixture needs a non-empty build side")
    val mask = Sketch.bloomBuild(bad, "s_suppkey", 2048, 3)
    // probe a key space disjoint from any supplier key
    val probe = spark.range(100000, 101000).select(col("id").as("k"))
    val fp = probe.filter(Sketch.bloomProbe(col("k"), mask, 2048, 3)).count()
    // k=3, m=2048: with n<=100 set bits the fp rate is (3n/2048)^3 << 1%;
    // allow generous slack for hash clumping
    assert(fp < 50, s"$fp/1000 false positives — filter is not selective")
  }

  test("hll registers merge distributively (the 1000-executor property)") {
    // Registers from disjoint halves, merged with MAX per bucket, must
    // equal the registers of the whole input — the algebraic property
    // that lets partial aggregation do the work map-side at any scale.
    val li = Tables.lineitem(spark, sf0001)
    val whole = Sketch.hllRegisters(li, "l_partkey", Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lo = Sketch.hllRegisters(li.filter(col("l_orderkey") % 2 === 0), "l_partkey", Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hi = Sketch.hllRegisters(li.filter(col("l_orderkey") % 2 =!= 0), "l_partkey", Seq.empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = (lo.keySet ++ hi.keySet).map { b =>
      b -> math.max(lo.getOrElse(b, 0L), hi.getOrElse(b, 0L))
    }.toMap
    assert(merged == whole)
  }

  test("bloom probe plans with no join and no extra shuffle on the fact side") {
    val li = Tables.lineitem(spark, sf0001)
    val bad = Tables.supplier(spark, sf0001)
      .filter(col("s_suppkey") % 3 === 0).select("s_suppkey")
    val mask = Sketch.bloomBuild(bad, "s_suppkey", 2048, 3)
    val probed = li.filter(Sketch.bloomProbe(col("l_suppkey"), mask, 2048, 3))
    val plan = probed.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"bloom probe must be a map-side filter, got:\n$plan")
    assert(!plan.contains("Exchange"), s"bloom probe must not shuffle, got:\n$plan")
  }

  test("zValue matches a bit-twiddling reference") {
    def ref(x: Long, y: Long, bits: Int): Long = {
      var z = 0L
      for (b <- 0 until bits) {
        z |= ((x >> b) & 1L) << (2 * b)
        z |= ((y >> b) & 1L) << (2 * b + 1)
      }
      z
    }
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 1023L), (512L, 7L), (345L, 678L))
    val df = spark.createDataFrame(rows).toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(Seq(col("x"), col("y")), 10).as("z"))
    df.collect().foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(z == ref(x, y, 10), s"z($x,$y) = $z, want ${ref(x, y, 10)}")
    }
  }

  test("clusterByZ: partition z-ranges are disjoint and sorted within") {
    val li = Tables.lineitem(spark, sf0001)
      .select(pmod(col("l_partkey"), lit(1024L)).cast("long").as("xb"),
        pmod(col("l_suppkey"), lit(1024L)).cast("long").as("yb"))
    val clustered = Layout.clusterByZ(li, Seq("xb", "yb"), 10, numFiles = 8)
    // recompute z per output partition; ranges must not overlap across
    // partitions (range partitioning) — the property that makes file-level
    // min/max pruning effective on both dimensions
    val perPart = clustered
      .withColumn("z", Layout.zValue(Seq(col("xb"), col("yb")), 10))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(min("z").as("lo"), max("z").as("hi"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(perPart.length > 1, "expected multiple non-empty partitions")
    perPart.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"z-ranges overlap: hi=$hi1 > next lo=$lo2")
      case _ =>
    }
  }
}
