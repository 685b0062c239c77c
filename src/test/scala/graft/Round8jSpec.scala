package graft

import org.apache.spark.sql.functions._

/** q284's delta-join decomposition: the four terms must tile the pair
  * space (disjoint, each non-trivial on the fixture) and the delta
  * reads must touch only appended files — the property that makes the
  * view update O(batch), not O(table). */
class Round8jSpec extends SparkSpec {

  // sf0.01, not sf0.001: the 5000-orderkey split needs the larger key
  // range for both feed halves to be non-empty (the hash-gate scale)
  private val sf001 = "/root/testdata/sf0.01"

  test("q284: the four join terms are disjoint, non-trivial, and tile the flat join") {
    import graft.operators.TxLog
    val (oz, og1) = Round7cQueries.changeFeedZone(spark, sf001)
    val (lz, lg1) = Round8jQueries.lineitemFeedZone(spark, sf001)
    def snapAt(zone: String, g: Long) = TxLog.readSnapshot(spark, zone,
      TxLog.snapshotAt(spark, zone, g).get)
    val o0 = snapAt(oz, og1); val dO = TxLog.appendedBetween(spark, oz, og1)
    val l0 = snapAt(lz, lg1); val dL = TxLog.appendedBetween(spark, lz, lg1)
    def n(o: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
      o.join(l, col("l_orderkey") === col("o_orderkey")).count()
    val terms = Seq(n(o0, l0), n(dO, l0), n(o0, dL), n(dO, dL))
    // same split key on both sides: an order's lines land entirely in
    // the matching half, so the CROSS terms are empty and base+delta
    // tiles the flat join — the disjointness the decomposition needs
    assert(terms(1) === 0L && terms(2) === 0L,
      "matching split keys must empty the cross terms on this fixture")
    assert(terms(0) > 0L && terms(3) > 0L)
    val flat = graft.sources.Tables.orders(spark, sf001)
      .join(graft.sources.Tables.lineitem(spark, sf001),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(terms.sum === flat, "the four terms must tile the flat join exactly")
  }

  test("q284: delta reads scan only the appended files, not the zone") {
    import graft.operators.TxLog
    val (oz, og1) = Round7cQueries.changeFeedZone(spark, sf001)
    val head = TxLog.latest(spark, oz).getOrElse(sys.error("no head"))
    val baseFiles = TxLog.snapshotAt(spark, oz, og1).get.resolve(oz)
      .flatMap(p => Seq(p, "file:" + p)).toSet
    val delta = TxLog.appendedBetween(spark, oz, og1)
    val scanned = delta.inputFiles.toSet
    assert(scanned.nonEmpty)
    assert(scanned.intersect(baseFiles).isEmpty,
      "the change feed must never re-read base-generation files")
    assert(scanned.size < head.files.size,
      "delta scan must be a strict subset of the zone")
  }
}
