package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Centroid of `array<float>` embeddings as a typed [[Aggregator]] — the
  * declared custom-UDAF surface (SURVEY §2.2: "Aggregator[IN,BUF,OUT] for
  * custom aggs (e.g. vector centroid)").
  *
  * Merge-associative partial aggregation: each task folds its rows into a
  * (sum-vector, count) buffer, buffers merge pairwise across the shuffle —
  * the same two-phase shape as built-in aggregates, so a 100 TB groupBy
  * ships one buffer per (group, task), never rows. Register for SQL with
  * `functions.udaf(VectorCentroid)`.
  */
case class CentroidBuf(sums: Array[Double], n: Long)

object VectorCentroid extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {
  type Buf = CentroidBuf
  private def Buf(s: Array[Double], n: Long): CentroidBuf = CentroidBuf(s, n)

  override def zero: Buf = Buf(Array.emptyDoubleArray, 0L)

  private def addInto(sums: Array[Double], v: Seq[Float]): Array[Double] = {
    val out = if (sums.isEmpty) new Array[Double](v.length) else sums
    var i = 0
    while (i < v.length && i < out.length) { out(i) += v(i); i += 1 }
    out
  }

  override def reduce(b: Buf, v: Seq[Float]): Buf =
    if (v == null) b else Buf(addInto(b.sums, v), b.n + 1)

  override def merge(a: Buf, b: Buf): Buf =
    if (a.n == 0) b
    else if (b.n == 0) a
    else {
      val out = a.sums.clone()
      var i = 0
      while (i < out.length && i < b.sums.length) { out(i) += b.sums(i); i += 1 }
      Buf(out, a.n + b.n)
    }

  override def finish(b: Buf): Seq[Double] =
    if (b.n == 0) Seq.empty else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
