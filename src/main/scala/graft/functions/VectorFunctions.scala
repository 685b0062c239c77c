package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * codegen'd higher-order functions (`aggregate`/`zip_with`) — no UDFs, no
  * serialization boundary, stays inside whole-stage codegen.
  *
  * Every element is cast to double BEFORE arithmetic and folds run strictly
  * left-to-right, so results are bit-identical to any engine that does the
  * same (the DuckDB oracle mirrors this with `list_transform` +
  * `list_aggregate('sum')`).
  */
object VectorFunctions {

  private val D = "double"

  /** Sum of a double-array, left-to-right fold. */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float vectors, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(a, b, (x, y) => x.cast(D) * y.cast(D)))

  /** Squared L2 norm, accumulated in double. */
  def normSq(a: Column): Column =
    arraySum(transform(a, x => x.cast(D) * x.cast(D)))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0.0 for zero-norm inputs (guarded division). */
  def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(normSq(a)) * sqrt(normSq(b))
    when(denom === 0.0, lit(0.0)).otherwise(dot(a, b) / denom)
  }

  /** Euclidean (L2) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(arraySum(zip_with(a, b, (x, y) => (x.cast(D) - y.cast(D)) * (x.cast(D) - y.cast(D)))))
}
