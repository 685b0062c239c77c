package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy gates for dataset release — the counterpart of the PII
  * redaction tier (q74): redaction rewrites VALUES, these operators
  * decide which ROWS are safe to publish at all.
  *
  * Reference scope note: the reference pipeline lands raw CDC records in
  * a lake (lib/glue_jobs/ddb_full_load.py, firehose_transformation.py)
  * with no release gate; this is part of the training-data north star,
  * where a corpus cut is published downstream.
  */
object Privacy {

  /** k-anonymity release decision over a quasi-identifier projection:
    * a row may be released only if at least `k` rows (itself included)
    * share its full quasi-identifier combination — the classic
    * Sweeney-style suppression gate. Returns every input row with its
    * group size (`qi_n`) and the 0/1 `released` verdict, so callers can
    * either filter to the releasable cut or audit what suppression
    * costs.
    *
    * Scale shape: one two-phase count aggregation on the QI combination
    * plus one equi-join back on the same key. The group relation has one
    * row per DISTINCT QI combination — usually small enough that Spark
    * picks a broadcast build side on its own; the join key is the QI
    * tuple, so a hot combination is a big GROUP (fine — one count row)
    * but never a skewed join fan-out (each input row matches exactly one
    * group row). */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(!df.columns.contains("qi_n") && !df.columns.contains("released"),
      "input already has a qi_n/released column; rename it first")
    val groups = df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("qi_n"))
    df.join(groups, qiCols)
      .withColumn("released", (col("qi_n") >= k).cast("int"))
  }
}
