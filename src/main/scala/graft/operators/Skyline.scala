package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier): rows not dominated by any other row,
  * where `r2` dominates `r1` iff r2.min <= r1.min AND r2.max >= r1.max
  * with at least one strict — "no other part is both cheaper and larger".
  *
  * Spark has no skyline operator and the naive formulation is an
  * inequality anti-join — a nested-loop over n² pairs. This is the
  * classic two-phase distributed skyline instead:
  *   1. LOCAL: each partition sorts by (min asc, max desc) and sweeps
  *      once, keeping a row iff its max strictly exceeds the best max
  *      seen among strictly-cheaper rows (equal-(min,max) ties all
  *      survive — neither dominates the other). A partition's survivors
  *      are a superset of no one: local skylines are tiny in practice
  *      (O(log n) expected for independent dims).
  *   2. GLOBAL: the union of local skylines — orders of magnitude smaller
  *      than the input — collapses to one partition and the same sweep
  *      runs once more. Skyline is partition-invariant, so the result is
  *      deterministic regardless of how the input was split.
  *
  * At 100 TB the local phase does all the data reduction map-side with
  * zero shuffles; only the (small) candidate set crosses the wire. If a
  * pathological distribution kept local skylines large, the global phase
  * generalizes to a tree of sweeps — not needed here.
  */
object Skyline {

  /** Survivors of one sorted sweep. Input MUST be sorted by
    * (min asc, max desc); emits the partition's skyline. */
  private def sweep(rows: Iterator[Row], minIdx: Int, maxIdx: Int): Iterator[Row] = {
    // Rows arrive cheapest-first, and within a price tie largest-first:
    // a row survives iff no strictly-cheaper row had >= its max, and no
    // same-price row had a strictly larger max. Both reduce to tracking
    // the best (min, max) seen.
    // explicit first-row flag — a NaN sentinel would break on genuine NaN
    // measures (every later row would pass the "no rows yet" branch)
    var seen = false
    var bestMin = 0.0
    var bestMax = Double.NegativeInfinity
    rows.filter { r =>
      val mn = r.getDouble(minIdx)
      val mx = r.getDouble(maxIdx)
      val keep =
        if (!seen) true
        else if (mn == bestMin) mx == bestMax // price tie: only the group's max survives
        else mx > bestMax // strictly costlier: needs strictly larger max
      if (keep) { seen = true; bestMin = mn; bestMax = mx }
      keep
    }
  }

  /** Skyline of `df` minimizing `minCol` and maximizing `maxCol` (both
    * coerced to double for the comparison; all original columns pass
    * through). Null and NaN measures are excluded up front: neither is
    * comparable, so such a row can neither dominate nor claim
    * non-dominance (NaN would also sort above every real value and
    * corrupt the sweep order). */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val prepared = df
      .filter(col(minCol).isNotNull && col(maxCol).isNotNull &&
        !isnan(col(minCol).cast("double")) && !isnan(col(maxCol).cast("double")))
      .withColumn("__sky_min", col(minCol).cast("double"))
      .withColumn("__sky_max", col(maxCol).cast("double"))
    val schema = prepared.schema
    val minIdx = schema.fieldIndex("__sky_min")
    val maxIdx = schema.fieldIndex("__sky_max")
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(schema)

    val local = prepared
      .sortWithinPartitions(col("__sky_min").asc, col("__sky_max").desc)
      .mapPartitions(it => sweep(it, minIdx, maxIdx))

    // global pass over the (small) candidate union; repartition(1) +
    // full sort, then one sweep
    local
      .repartition(1)
      .sortWithinPartitions(col("__sky_min").asc, col("__sky_max").desc)
      .mapPartitions(it => sweep(it, minIdx, maxIdx))
      .drop("__sky_min", "__sky_max")
  }
}
