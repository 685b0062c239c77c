package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew mitigation for joins with hot keys (SURVEY §4 / builder brief:
  * "salting for skew").
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default in GraftSession) handles sort-merge skew at runtime; explicit
  * salting remains the tool when a key is so hot it overwhelms a single
  * task even after AQE splitting, or for aggregation skew. The classic
  * two-phase shapes:
  *
  *  - join: fact side gets a deterministic salt in [0, k), the dim side is
  *    exploded k ways, and the join key becomes (key, salt) — the hot
  *    key's rows spread over k tasks at the cost of k copies of the dim
  *    rows (cheap when the dim side is small relative to the skew).
  *  - aggregation: partial-aggregate on (key, salt), then final-aggregate
  *    on key — two small shuffles instead of one skewed one.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Join types whose semantics survive dim-side explosion: the fact side
    * keeps exactly one salted copy per row, so fact-preserving joins are
    * safe. right/full outer are NOT: an unmatched dim row would surface k
    * duplicate null-extended copies. */
  private val SafeJoinTypes = Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  /** Deterministic salt in [0, k): hashes a unique column so re-runs and
    * retries assign identically (no rand() — Spark may re-execute tasks,
    * and nondeterministic salts break join correctness on retry). */
  def salt(uniqueCol: Column, k: Int): Column = {
    require(k > 0, s"salt factor must be positive, got $k")
    pmod(hash(uniqueCol), lit(k))
  }

  private def checkNoSaltCol(df: DataFrame, side: String): Unit =
    require(!df.columns.contains(SaltCol),
      s"$side input already has a $SaltCol column; rename it before salting")

  /** Equi-join `fact` with `dim` on `factKey == dimKey`, salted k ways.
    * `factUnique` must be any column (or combination) unique-ish per fact
    * row — it only drives the salt distribution. Only fact-preserving join
    * types are allowed (see [[SafeJoinTypes]]). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, factUnique: String, k: Int,
                 joinType: String = "inner"): DataFrame = {
    require(k > 0, s"salt factor must be positive, got $k")
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"joinType '$joinType' not supported: dim-side explosion duplicates " +
        "unmatched dim rows under right/full outer joins")
    checkNoSaltCol(fact, "fact"); checkNoSaltCol(dim, "dim")
    val salted = fact.withColumn(SaltCol, salt(col(factUnique), k))
    val exploded = dim.withColumn(SaltCol, explode(array((0 until k).map(lit): _*)))
    salted.join(exploded,
        salted(factKey) === exploded(dimKey) && salted(SaltCol) === exploded(SaltCol),
        joinType)
      .drop(SaltCol)
  }

  /** Skew-safe per-key top-k — the two-level tournament replacement for
    * `row_number().over(Window.partitionBy(key).orderBy(sort)) <= k`.
    * The single-window form hands each key's ENTIRE group to one task;
    * with a handful of giant keys (languages, sources, domains) that is
    * the same one-task collapse GlobalOrder exists to avoid on global
    * windows. Round 1 tags each row with its arrival partition id and
    * keeps the local top-k per (key, partition) — the exchange key is
    * (key, bucket), spread over every input partition, and at most k·P
    * rows per key survive. Round 2 runs the per-key window over that
    * bounded union only. Top-k of a union of per-bucket top-ks is the
    * global top-k under ANY row-to-bucket assignment, so the result is
    * deterministic (and equal to the window form) whenever `sortCols` is
    * a total order within each key — the same tie contract as the window
    * it replaces. `spark_partition_id()` is materialized through a
    * projection before the window so task retries cannot re-deal rows
    * mid-window. */
  def topKPerKey(df: DataFrame, keyCols: Seq[Column], sortCols: Seq[Column],
                 k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(keyCols.nonEmpty, "topKPerKey needs at least one key column")
    val bucket = "__graft_bucket"
    val rn = "__graft_rn"
    require(!df.columns.contains(bucket) && !df.columns.contains(rn),
      s"input already has a $bucket/$rn column; rename it first")
    val w1 = Window.partitionBy(keyCols :+ col(bucket): _*).orderBy(sortCols: _*)
    val w2 = Window.partitionBy(keyCols: _*).orderBy(sortCols: _*)
    df.withColumn(bucket, spark_partition_id())
      .withColumn(rn, row_number().over(w1))
      .filter(col(rn) <= k)
      .drop(bucket, rn)
      .withColumn(rn, row_number().over(w2))
      .filter(col(rn) <= k)
      .drop(rn)
  }

  /** Two-phase salted aggregation: count/sum per key without a single
    * task owning a hot key's whole partition. Values go through
    * decimal(38,6) for order-independent exact sums — values are rounded
    * to 6 decimal places, and |v| must be < 1e32 (enforced: overflow
    * yields null, which would silently drop rows from the sum). */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     uniqueCol: String, k: Int): DataFrame = {
    require(k > 0, s"salt factor must be positive, got $k")
    checkNoSaltCol(df, "input")
    val dec = col(valueCol).cast("decimal(38,6)")
    val checked = when(col(valueCol).isNotNull && dec.isNull,
        raise_error(lit(s"$valueCol overflows decimal(38,6)")))
      .otherwise(dec)
    df.withColumn(SaltCol, salt(col(uniqueCol), k))
      .groupBy(col(key), col(SaltCol))
      .agg(count(lit(1)).as("_cnt"), sum(checked).as("_sum"))
      .groupBy(col(key))
      .agg(sum(col("_cnt")).as("cnt"), sum(col("_sum")).cast("double").as("sum_value"))
  }
}
