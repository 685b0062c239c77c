package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** General as-of join: for each probe row, the most recent reference row
  * with `ts <= probe.ts` in the same key group (the classic trades⋈quotes
  * shape; Q35 declares the self-join special case, this is the two-relation
  * general form).
  *
  * Implementation is union + ONE window pass, not a range join: tag both
  * relations, sort each key group once by `(ts, side, seq)` with references
  * before probes at equal timestamps (inclusive semantics), and carry the
  * last non-null reference value forward. Cost is one shuffle+sort over
  * |probes| + |refs| rows — a range/theta join would explode to the
  * candidate cross-product per key and re-filter, which is the formulation
  * that dies at 100 TB.
  */
object AsOf {

  /** Join the latest reference value at-or-before each probe row's time.
    *
    * Output: all `probes` columns + `outCol` (the as-of `refValCol`, null
    * when no reference precedes the probe). Equal-timestamp references
    * resolve to the one with the greatest `seqCol` (deterministic).
    *
    * A reference row whose `refValCol` is NULL still counts as the latest
    * reference (its null wins over any older non-null value): reference
    * PRESENCE is tracked by a non-null struct marker, so "latest value is
    * null" and "no reference yet" are distinguishable — both yield a null
    * `outCol`, but a null-valued reference correctly shadows older values
    * instead of being skipped by `ignoreNulls`.
    */
  def joinLatest(probes: DataFrame, refs: DataFrame, keyCols: Seq[String],
                 tsCol: String, seqCol: String, refValCol: String,
                 outCol: String = "asof_value"): DataFrame = {
    val internal = Seq("_ts", "_seq", "_ref_val", "_side", "_probe")
    require((probes.columns ++ refs.columns).intersect(internal).isEmpty,
      s"input columns collide with internal names ${internal.mkString(", ")}")
    val refValType = refs.schema(refValCol).dataType
    val markerType = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("v", refValType)))
    val probeStruct = org.apache.spark.sql.types.StructType(probes.schema)
    // unresolved col() refs — resolved against whichever side they are
    // select()ed on below
    val sideCols: Seq[Column] =
      keyCols.map(col) ++ Seq(col(tsCol).as("_ts"), col(seqCol).as("_seq"))
    // _ref_val is struct(v) on reference rows (non-null even when v is null)
    // and a null struct on probe rows — `last(ignoreNulls)` then skips probe
    // rows but never a genuine reference, null-valued or not.
    val r = refs.select(sideCols
      ++ Seq(struct(col(refValCol).as("v")).as("_ref_val"), lit(0).as("_side"),
        lit(null).cast(probeStruct).as("_probe")): _*)
    val p = probes.select(sideCols
      ++ Seq(lit(null).cast(markerType).as("_ref_val"), lit(1).as("_side"),
        struct(probes.columns.toIndexedSeq.map(col): _*).as("_probe")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts"), col("_side"), col("_seq"))
      .rowsBetween(Window.unboundedPreceding, 0)
    r.unionByName(p)
      .withColumn(outCol, last(col("_ref_val"), ignoreNulls = true).over(w)("v"))
      .filter(col("_side") === 1)
      .select(col("_probe.*"), col(outCol))
  }

  /** The FORWARD as-of join: the earliest reference at-or-after each
    * probe row's time (the mirror of [[joinLatest]] — "what is the next
    * quote after this trade"). Same union + ONE window pass, with the
    * walk reversed: key groups sort by (ts DESC, side, seq DESC), so the
    * carried-forward last reference at a probe's row is the SMALLEST
    * reference timestamp >= the probe's, inclusive at equal timestamps,
    * ties to the LOWEST `seqCol`. Null-valued references shadow later
    * (in time: earlier in the walk) values via the same struct marker. */
  def joinNext(probes: DataFrame, refs: DataFrame, keyCols: Seq[String],
               tsCol: String, seqCol: String, refValCol: String,
               outCol: String = "asof_value"): DataFrame = {
    val internal = Seq("_ts", "_seq", "_ref_val", "_side", "_probe")
    require((probes.columns ++ refs.columns).intersect(internal).isEmpty,
      s"input columns collide with internal names ${internal.mkString(", ")}")
    val refValType = refs.schema(refValCol).dataType
    val markerType = org.apache.spark.sql.types.StructType(
      Seq(org.apache.spark.sql.types.StructField("v", refValType)))
    val probeStruct = org.apache.spark.sql.types.StructType(probes.schema)
    val sideCols: Seq[Column] =
      keyCols.map(col) ++ Seq(col(tsCol).as("_ts"), col(seqCol).as("_seq"))
    val r = refs.select(sideCols
      ++ Seq(struct(col(refValCol).as("v")).as("_ref_val"), lit(0).as("_side"),
        lit(null).cast(probeStruct).as("_probe")): _*)
    val p = probes.select(sideCols
      ++ Seq(lit(null).cast(markerType).as("_ref_val"), lit(1).as("_side"),
        struct(probes.columns.toIndexedSeq.map(col): _*).as("_probe")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").desc, col("_side"), col("_seq").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    r.unionByName(p)
      .withColumn(outCol, last(col("_ref_val"), ignoreNulls = true).over(w)("v"))
      .filter(col("_side") === 1)
      .select(col("_probe.*"), col(outCol))
  }

  /** NEAREST-event as-of: the reference closest in time in EITHER
    * direction — a pure COMPOSITION of [[joinLatest]] and [[joinNext]]
    * with the reference value packed beside its epoch-micros timestamp,
    * so the chooser compares exact non-negative BIGINT distances.
    *
    * Output: all `probes` columns plus `<prefix>_side` ('prev' | 'next'
    * | 'none'), `<prefix>_value` (the chosen `refValCol`, null on
    * 'none') and `<prefix>_delta_us`. Equal distances pick 'prev' (the
    * earlier reference) — the determinism knob; a probe with no
    * reference in either direction picks 'none'. Equal-timestamp
    * references are inclusive on BOTH walks (delta 0 — always 'prev').
    * Cost: the two underlying union+window passes, chooser map-side —
    * still never a range join. */
  def joinNearest(probes: DataFrame, refs: DataFrame, keyCols: Seq[String],
                  tsCol: String, seqCol: String, refValCol: String,
                  outPrefix: String = "nearest"): DataFrame = {
    require(!probes.columns.contains("_prev") && !probes.columns.contains("_next"),
      "_prev/_next are reserved; rename those probe columns")
    val packed = refs.select(keyCols.map(col) ++ Seq(col(tsCol), col(seqCol),
      struct(col(refValCol).as("v"), unix_micros(col(tsCol)).as("t")).as("_vt")): _*)
    val both = joinNext(
      joinLatest(probes, packed, keyCols, tsCol, seqCol, "_vt", "_prev"),
      packed, keyCols, tsCol, seqCol, "_vt", "_next")
    val pts = unix_micros(col(tsCol))
    val none = col("_prev").isNull && col("_next").isNull
    val pickPrev = col("_next").isNull ||
      (col("_prev").isNotNull && (pts - col("_prev.t")) <= (col("_next.t") - pts))
    both.withColumn(s"${outPrefix}_side",
        when(none, "none").when(pickPrev, "prev").otherwise("next"))
      .withColumn(s"${outPrefix}_value",
        when(none, lit(null)).when(pickPrev, col("_prev.v")).otherwise(col("_next.v")))
      .withColumn(s"${outPrefix}_delta_us",
        when(none, lit(null).cast("long"))
          .when(pickPrev, pts - col("_prev.t"))
          .otherwise(col("_next.t") - pts))
      .drop("_prev", "_next")
  }
}
