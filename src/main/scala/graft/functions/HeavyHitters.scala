package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One heavy-hitter entry: `count` is a LOWER bound on the item's true
  * frequency, and `true - count <= err` (the summary's decrement total). */
case class HeavyHit(item: String, count: Long, err: Long)

/** Misra–Gries heavy-hitters buffer: at most k tracked counters plus the
  * total decrement mass applied so far (the error bound). */
case class MGBuf(counts: Map[String, Long], decremented: Long)

/** Misra–Gries / Space-Saving-style heavy hitters over a string column as
  * a typed [[Aggregator]] — the one-pass, bounded-memory answer to "which
  * tokens dominate this 100 TB corpus" (vocab pruning, stop-list mining,
  * skew-key detection before a join).
  *
  * Why not `groupBy(token).count().orderBy(...).limit(j)`: that shuffles
  * one row per DISTINCT token (billions for web-scale text) to rank a
  * handful. This summary keeps k counters per partial buffer, merges
  * pairwise across the shuffle (mergeable-summaries semantics), and ships
  * O(k) state per task total — the classic sketch trade:
  *
  *  - every reported `count` is a lower bound; true freq <= count + err;
  *  - any item with true frequency > n/(k+1) of n rows is GUARANTEED to
  *    be in the summary (pinned by HeavyHittersSpec's property test);
  *  - with <= k distinct items the result is exact (err = 0).
  *
  * Results depend on encounter order only in which SUB-threshold items
  * ride along — so the operator is validated by its mathematical
  * guarantees (property tests), not a row-hash oracle, like MinHash/HLL
  * (SURVEY §2.2 non-hash surface).
  */
case class HeavyHitters(k: Int) extends Aggregator[String, MGBuf, Seq[HeavyHit]] {
  require(k >= 1, s"heavy-hitters capacity must be >= 1, got $k")

  override def zero: MGBuf = MGBuf(Map.empty, 0L)

  override def reduce(b: MGBuf, item: String): MGBuf = {
    if (item == null) return b
    b.counts.get(item) match {
      case Some(c) => b.copy(counts = b.counts.updated(item, c + 1))
      case None if b.counts.size < k =>
        b.copy(counts = b.counts.updated(item, 1L))
      case None =>
        // canonical MG step: no free slot -> decrement every counter,
        // dropping zeros; the new item is NOT inserted
        val dec = b.counts.collect { case (i, c) if c > 1 => i -> (c - 1) }
        MGBuf(dec, b.decremented + 1)
    }
  }

  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    if (a.counts.isEmpty && a.decremented == 0) return b
    if (b.counts.isEmpty && b.decremented == 0) return a
    // pointwise sum keeps the lower-bound property; if the union exceeds k
    // counters, subtract the (k+1)-th largest count from all (mergeable-
    // summaries reduction) and add it to the error mass
    val summed = (a.counts.keySet ++ b.counts.keySet).iterator.map { i =>
      i -> (a.counts.getOrElse(i, 0L) + b.counts.getOrElse(i, 0L))
    }.toMap
    val d = a.decremented + b.decremented
    if (summed.size <= k) MGBuf(summed, d)
    else {
      val kth = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      val kept = summed.collect { case (i, c) if c > kth => i -> (c - kth) }
      MGBuf(kept, d + kth)
    }
  }

  override def finish(b: MGBuf): Seq[HeavyHit] =
    b.counts.toSeq
      .map { case (i, c) => HeavyHit(i, c, b.decremented) }
      .sortBy(h => (-h.count, h.item))

  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[Seq[HeavyHit]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HeavyHit]]()
}
