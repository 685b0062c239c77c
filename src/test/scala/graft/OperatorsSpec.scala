package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, FullLoad, Similarity, TextAnalysis}
import graft.functions.VectorFunctions

class FullLoadSpec extends SparkSpec {
  test("split-count heuristic matches the reference formula, clamped at 1") {
    assert(FullLoad.splitCount("G.2X", 3) === 32) // 16*(W-1), ddb_full_load.py:41
    assert(FullLoad.splitCount("G.1X", 3) === 16) // 8*(W-1), :43
    assert(FullLoad.splitCount("Standard", 3) === 12) // 4*((W-1)*2-1), :45
    assert(FullLoad.splitCount("Standard", 1) === 1) // reference yields -4; we clamp
  }

  test("full-load pipeline: overwrite parquet round-trip with requested file count") {
    val dir = java.nio.file.Files.createTempDirectory("fullload").toString + "/out"
    val src = spark.read.parquet(s"$sf0001/nation.parquet")
    FullLoad.run(src, dir, outputPartitions = 3)
    FullLoad.run(src, dir, outputPartitions = 3) // idempotent overwrite (A5)
    val back = FullLoad.readBack(spark, dir)
    assert(back.count() === 25)
    assert(back.rdd.getNumPartitions === 3)
  }
}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cosine/dot/norm on known vectors") {
    val df = Seq((Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 2f, 2f), Array(1f, 2f, 2f)),
      (Array(0f, 0f, 0f), Array(1f, 1f, 1f))).toDF("a", "b")
    val rows = df.select(
      VectorFunctions.dot($"a", $"b"),
      VectorFunctions.norm($"a"),
      VectorFunctions.cosine($"a", $"b")).collect()
    assert(rows(0).getDouble(0) === 0.0)
    assert(rows(0).getDouble(2) === 0.0) // orthogonal
    assert(rows(1).getDouble(1) === 3.0) // |(1,2,2)| = 3
    assert(math.abs(rows(1).getDouble(2) - 1.0) < 1e-12) // parallel
    assert(rows(2).getDouble(2) === 0.0) // zero-norm guard, no NaN
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens drop empties; shingles are distinct ordered 3-grams") {
    val df = Seq("a b  c d", "x y").toDF("text")
    val out = df.select(
      TextAnalysis.tokens($"text").as("t"),
      TextAnalysis.shingles(TextAnalysis.tokens($"text")).as("sh")).collect()
    assert(out(0).getSeq[String](0) === Seq("a", "b", "c", "d"))
    assert(out(0).getSeq[String](1) === Seq("a b c", "b c d"))
    assert(out(1).getSeq[String](1) === Seq.empty) // shorter than n
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq("a b c", "c b a", "a b c").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint(TextAnalysis.tokens($"text"))).collect()
      .map(_.getLong(0))
    assert(fps(0) === fps(2))
    assert(fps(0) !== fps(1))
  }

  test("quality score: stopword-free 100-token doc scores 1.0") {
    val doc = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq(doc, "the a of").toDF("text")
    val qs = df.select(round(TextAnalysis.qualityScore(TextAnalysis.tokens($"text")), 4)).collect()
    assert(qs(0).getDouble(0) === 1.0)
    assert(qs(1).getDouble(0) === 0.0) // all stopwords
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 1
    (3L, "completely different words in this sentence about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups by content hash with canonical min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .orderBy("canonical_id").collect()
    assert(g.length === 3)
    assert(g.head.getAs[Long]("cnt") === 2)
    assert(g.head.getAs[Long]("canonical_id") === 1L)
  }

  test("jaccard pairs and minhash LSH agree and find the near-dup") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
      .orderBy("a_id", "b_id").collect()
    val lsh = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .orderBy("a_id", "b_id").collect()
    assert(exact.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(exact.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ===
      lsh.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
    // exact duplicate pair has jaccard exactly 1.0
    assert(exact.find(r => r.getLong(0) == 1L && r.getLong(1) == 4L).get.getDouble(2) === 1.0)
  }

  test("simhash: identical docs collide, near-dups are hamming-close") {
    val sh = docs.select($"doc_id", Dedup.simhash32(TextAnalysis.tokens($"text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) === sh(4L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(2L)) <= 8)
    assert(sh.values.forall(v => v >= 0 && v < (1L << 32)))
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)) && pairs.contains((1L, 2L)))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("IVF top-k equals brute force when the probed cell holds the answers") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val query = emb.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val brute = Similarity.bruteForceTopK(emb.filter($"vec_id" =!= 0), query, 5).collect()
    assert(brute.length === 5)
    assert(brute.map(_.getDouble(1)).toSeq === brute.map(_.getDouble(1)).sorted.reverse.toSeq)
    // IVF with a single centroid probes everything -> must equal brute force
    val cents = emb.filter($"vec_id" === 0)
      .select($"vec_id".as("cent_id"), $"embedding".as("ce"))
    val assigned = Similarity.assignToCentroids(emb, cents)
    val ivf = Similarity.ivfTopK(assigned.filter($"vec_id" =!= 0), cents, query, 5).collect()
    assert(ivf.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      brute.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }
}

/** SURVEY §2.2 non-hash surface: approximate aggregates validated by
  * tolerance against the exact answer, not by oracle hash. */
class ApproxSpec extends SparkSpec {
  test("approx_count_distinct within 5% of exact (HLL default rsd)") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val r = li.select(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect().head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact drift > 5%")
  }

  test("approx_percentile within 5% of exact interpolating percentile (q52's approximate sibling)") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    val r = li.select(
      percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx")).collect().head
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact drift > 5%")
  }
}

/** SQL-surface registration of the custom kernels. */
class GraftFunctionsSpec extends SparkSpec {
  test("vec_dot / vec_norm_sq / minhash_sig usable from spark.sql") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0F,2.0F), array(3.0F,4.0F)) AS d, " +
      "vec_norm_sq(array(3.0F,4.0F)) AS n").collect().head
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 25.0)
    val sig = spark.sql("SELECT minhash_sig(array(42L, 7L), 4) AS s")
      .collect().head.getSeq[Long](0)
    assert(sig.length === 4)
    // mins match the permutation family directly
    val expect = (0 until 4).map { i =>
      Seq(42L, 7L).map(h => (h * graft.functions.HashFunctions.permA(i) +
        graft.functions.HashFunctions.permB(i)) % graft.functions.HashFunctions.P).min
    }
    assert(sig === expect)
  }

  test("simhash32 / vec_centroid / heavy_hitters usable from spark.sql") {
    graft.functions.GraftFunctions.registerAll(spark)
    // simhash32 of one token hash: every set bit of the hash contributes
    // +1 at its position, unset bits -1 -> simhash == the hash itself
    // (within 32 bits)
    val sh = spark.sql("SELECT simhash32(array(5L)) AS s").collect().head.getLong(0)
    assert(sh === 5L)
    val c = spark.sql(
      "SELECT vec_centroid(v) AS c FROM VALUES (array(1.0F,2.0F)), (array(3.0F,4.0F)) t(v)")
      .collect().head.getSeq[Double](0)
    assert(c === Seq(2.0, 3.0))
    val hh = spark.sql(
      "SELECT explode(heavy_hitters(t)) AS h FROM VALUES ('a'),('a'),('b') t(t)")
      .select("h.*").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(hh === Map("a" -> 2L, "b" -> 1L))
  }

  test("simhash32 rejects non-array<bigint> input at analysis, not runtime") {
    graft.functions.GraftFunctions.registerAll(spark)
    // array<int> would be silently misread by getLong without the check
    val e = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT simhash32(array(1, 2))").collect())
    assert(e.getMessage.contains("array<bigint>"))
  }
}

/** MinHash collision-probability property (SURVEY §5.2 item 3): the
  * fraction of agreeing signature positions estimates Jaccard similarity.
  * Deterministic construction (no random seeds -> no flakes): doc pairs
  * share k of 20 trigram-generating tokens, sweeping J from 0 to 1. */
class MinHashPropertySpec extends SparkSpec {
  test("signature agreement tracks exact Jaccard within estimator error") {
    import spark.implicits._
    val base = (0 until 40).map(i => s"tok$i")
    // pair k: doc A = tokens 0..19, doc B = tokens k..k+19 (overlap 20-k)
    val pairs = (0 to 20).map { k =>
      (k.toLong, base.slice(0, 20).mkString(" "), base.slice(k, k + 20).mkString(" "))
    }
    val df = pairs.toDF("k", "ta", "tb")
      .selectExpr("k",
        "filter(split(ta, ' '), t -> t <> '') as toksA",
        "filter(split(tb, ' '), t -> t <> '') as toksB")
    val withSh = df.select($"k",
      graft.operators.TextAnalysis.shingles($"toksA").as("sa"),
      graft.operators.TextAnalysis.shingles($"toksB").as("sb"))
    val sigs = withSh.select($"k",
      size(array_intersect($"sa", $"sb")).cast("double")
        ./(size(array_union($"sa", $"sb"))).as("jaccard"),
      graft.operators.Dedup.minhashSignature($"sa", 64).as("siga"),
      graft.operators.Dedup.minhashSignature($"sb", 64).as("sigb"))
    val rows = sigs.select($"k", $"jaccard",
      (size(filter(zip_with($"siga", $"sigb", (x, y) => x === y), b => b))
        .cast("double") / 64.0).as("estimate")).collect()
    val errs = rows.map(r => math.abs(r.getDouble(1) - r.getDouble(2)))
    // per-pair bound: binomial std-err at 64 hashes is <= 0.0625; allow 4 sigma
    assert(errs.forall(_ <= 0.25), s"estimator off: ${errs.mkString(",")}")
    // mean over the sweep is much tighter
    assert(errs.sum / errs.length <= 0.08, s"mean error ${errs.sum / errs.length}")
    // exact endpoints must be exact
    val byK = rows.map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byK(0L) === ((1.0, 1.0)))  // identical docs
    assert(byK(20L)._2 === 0.0)       // disjoint docs: no collisions at 64 hashes
  }
}

/** Property: the inverted-index jaccardPairs equals per-pair brute force
  * over every doc pair, on a deterministic corpus engineered to cover the
  * edge shapes (identical docs, full containment, partial overlap,
  * disjoint, too-short-to-shingle, duplicate shingles). */
class JaccardBruteForceSpec extends SparkSpec {
  test("jaccardPairs == brute-force pairwise Jaccard at every threshold") {
    import spark.implicits._
    val t = (0 until 12).map(i => s"w$i")
    def doc(ix: Seq[Int]) = ix.map(t).mkString(" ")
    val docs = Seq(
      1L -> doc(0 until 8),          // base
      2L -> doc(0 until 8),          // identical to 1
      3L -> doc(0 until 6),          // contained in 1
      4L -> doc(2 until 10),         // partial overlap
      5L -> doc(8 until 12),         // overlaps 4 only
      6L -> doc(Seq(0, 1)),          // too short for 3-shingles
      7L -> doc(Seq(5, 6, 7, 5, 6, 7, 5, 6, 7)) // repeated shingles
    ).toDF("doc_id", "text")

    // brute force: shingle sets per doc on the driver
    def shingleSet(s: String): Set[String] = {
      val toks = s.split(" ").filter(_.nonEmpty).toSeq
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.as[(Long, String)].collect().toMap.view.mapValues(shingleSet).toMap
    def bf(threshold: Double): Set[(Long, Long, Double)] = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = sets(a).intersect(sets(b)).size
      uni = sets(a).union(sets(b)).size
      if uni > 0 && inter > 0 // index join only surfaces co-shingled pairs
      j = BigDecimal(inter.toDouble / uni)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= threshold
    } yield (a, b, j)).toSet

    for (th <- Seq(0.2, 0.5, 0.8, 1.0)) {
      val got = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, threshold = th)
        .as[(Long, Long, Double)].collect().toSet
      val expected = bf(th)
      assert(got === expected, s"threshold $th: $got vs $expected")
    }
  }
}

/** Hyperplane-LSH ANN: query's own bucket contains the query's neighbors
  * often enough to be useful; here we pin determinism + containment. */
class LshAnnSpec extends SparkSpec {
  import spark.implicits._
  test("lshTopK is deterministic and a subset of brute-force candidates") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dim = emb.select(size($"embedding")).head.getInt(0)
    val query = emb.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val a = graft.operators.Similarity.lshTopK(emb.filter($"vec_id" =!= 0), query, 5, dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = graft.operators.Similarity.lshTopK(emb.filter($"vec_id" =!= 0), query, 5, dim)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a === b) // deterministic planes -> identical buckets both runs
    assert(a.nonEmpty) // the query's bucket is never empty for this corpus
    // every returned sim matches the exact cosine for that id (no fake scores)
    val brute = graft.operators.Similarity
      .bruteForceTopK(emb.filter($"vec_id" =!= 0), query, 499)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a.forall { case (id, sim) => brute(id) === sim })
  }
}

/** Custom typed Aggregator surface (SURVEY §2.2 UDAF line). */
class VectorCentroidSpec extends SparkSpec {
  import spark.implicits._
  test("per-label centroid equals the manual average, via udaf + groupBy") {
    val centroid = udaf(graft.functions.VectorCentroid)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val got = emb.groupBy($"label")
      .agg(centroid($"embedding").as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    // manual reference for one label
    val rows = emb.filter($"label" === 0).select($"embedding").collect()
      .map(_.getSeq[Float](0))
    val manual = rows.map(_.toVector).toVector.transpose
      .map(xs => xs.map(_.toDouble).sum / rows.length)
    assert(got(0).size === manual.size)
    got(0).zip(manual).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    // empty group behavior: centroid of nothing is empty, not a crash
    val empty = emb.filter($"label" === -999).agg(centroid($"embedding")).collect().head
    assert(empty.getSeq[Double](0).isEmpty)
  }
}
