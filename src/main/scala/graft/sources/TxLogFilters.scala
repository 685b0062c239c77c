package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources

/** Translate a pushed v1 [[sources.Filter]] back into a [[Column]]
  * predicate — the EXACT re-expression of the filter over a DataFrame,
  * not a widened pruning form. Two consumers:
  *
  *  - [[TxLogPrunableScan]] re-expresses its accepted (simple-shape)
  *    filters over the nested batch read so the inner parquet scan gets
  *    row-group min/max skipping inside each kept file;
  *  - SQL `DELETE FROM` on the DSv2 table ([[TxLogTable]] /
  *    [[GraftCatalog]]): Spark hands the WHERE clause as filters, and
  *    [[graft.operators.TxLog.deleteWhereFiles]] needs the exact
  *    predicate to split touched files into survivors and casualties.
  *    `canDeleteWhere` accepts a condition iff every conjunct translates
  *    here — a partial translation would delete the wrong rows.
  *
  * None = this filter has no exact Column form (the caller must treat
  * it as untranslatable, never approximate). Column references resolve
  * by name at execution; nested fields arrive dotted and `col` resolves
  * them the same way Spark's own translation does. */
private[graft] object TxLogFilters {

  def toColumn(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(c, v)            => Some(col(c) === lit(v))
    case sources.EqualNullSafe(c, v)      => Some(col(c) <=> lit(v))
    case sources.GreaterThan(c, v)        => Some(col(c) > lit(v))
    case sources.GreaterThanOrEqual(c, v) => Some(col(c) >= lit(v))
    case sources.LessThan(c, v)           => Some(col(c) < lit(v))
    case sources.LessThanOrEqual(c, v)    => Some(col(c) <= lit(v))
    case sources.In(c, vs)                => Some(col(c).isin(vs.toSeq: _*))
    case sources.IsNull(c)                => Some(col(c).isNull)
    case sources.IsNotNull(c)             => Some(col(c).isNotNull)
    case sources.StringStartsWith(c, v)   => Some(col(c).startsWith(v))
    case sources.StringEndsWith(c, v)     => Some(col(c).endsWith(v))
    case sources.StringContains(c, v)     => Some(col(c).contains(v))
    case sources.AlwaysTrue()             => Some(lit(true))
    case sources.AlwaysFalse()            => Some(lit(false))
    case sources.Not(child)               => toColumn(child).map(not)
    case sources.And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case _ => None
  }

  /** The conjunction of `filters` as one Column, when EVERY filter
    * translates (v1 filter arrays are implicitly ANDed). */
  def conjunction(filters: Seq[sources.Filter]): Option[Column] = {
    val cols = filters.map(toColumn)
    if (cols.forall(_.isDefined)) Some(cols.flatten.foldLeft(lit(true))(_ && _))
    else None
  }
}
