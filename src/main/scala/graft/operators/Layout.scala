package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional file-layout clustering (Z-order), the read-side
  * complement of [[Compaction]]: at 100 TB the dominant cost of a
  * selective query is how many files its filters can SKIP, and parquet
  * min/max footer pruning only skips what the write layout clustered.
  * Sorting by one key prunes that key alone; interleaving the bits of two
  * (or more) keys gives every participating key locality, so filters on
  * EITHER dimension prune most files (the Delta/Iceberg OPTIMIZE ZORDER
  * semantics, built here from plain column arithmetic).
  *
  * The z-value is pure integer math (floor-div bit extraction, identical
  * form in Spark and DuckDB), so layouts are deterministic and
  * oracle-checkable.
  */
object Layout {

  /** Interleave the low `bits` bits of each column into one z-value.
    * Column i contributes its bit b to output position `b * n + i` —
    * 2 cols × 10 bits = a 20-bit key. Inputs must be non-negative (callers
    * bucket raw keys first, e.g. `pmod(col, 1024)`); values wider than
    * `bits` have their high bits ignored, which keeps the arithmetic exact
    * but collapses distant values — bucket deliberately. Codegen-friendly:
    * expands to `bits * n` shift/add terms, no UDF, no shuffle. */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2, s"z-ordering needs >= 2 columns, got ${cols.size}")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits * cols must fit a long: got $bits x ${cols.size}")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield (floor(c / math.pow(2.0, b).toLong).cast("long") % 2L) *
      (1L << (b * n + i))
    terms.reduce(_ + _)
  }

  /** Oracle-SQL twin of [[zValue]] (DuckDB dialect) over column
    * expressions — same floor-div bit extraction, same positions. */
  def zValueSql(colExprs: Seq[String], bits: Int): String = {
    val n = colExprs.size
    val terms = for {
      (e, i) <- colExprs.zipWithIndex
      b <- 0 until bits
    } yield s"(CAST(FLOOR(($e) / ${1L << b}) AS BIGINT) % 2) * ${1L << (b * n + i)}"
    terms.mkString("(", " + ", ")")
  }

  /** Rewrite `df` into a z-clustered layout: range-partition by the
    * z-value (so files tile the z-curve in disjoint ranges), sort within
    * partitions (so each parquet row group's min/max footer is tight on
    * EVERY clustered column), and drop the helper column before handing
    * the frame to a writer. `numFiles` sizes the output exactly like
    * [[Compaction]]'s targetBytes-derived count. */
  def clusterByZ(df: DataFrame, cols: Seq[String], bits: Int, numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val zc = "__graft_z"
    df.withColumn(zc, zValue(cols.map(col), bits))
      .repartitionByRange(numFiles, col(zc))
      .sortWithinPartitions(zc)
      .drop(zc)
  }
}
