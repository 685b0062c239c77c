package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashFunctions

/** Approximate-query sketches built to be ENGINE-PORTABLE: every hash is
  * md5-derived ([[graft.functions.HashFunctions]]) and every floating step
  * is either exact in IEEE double or deferred to one final rounded
  * division, so a DuckDB oracle reproduces the sketch bit-for-bit. That is
  * the difference from Spark's built-ins (`approx_count_distinct`,
  * `bloom_filter_agg`): those are faster per-row but their estimates are
  * engine-private, so they can only be validated by tolerance tests —
  * these can sit in the hash-checked inventory.
  *
  * Scale design:
  *  - HLL: one map-side-combinable groupBy over (group, bucket) — at 100 TB
  *    the shuffle carries at most `groups x m` register rows (m = 64 here),
  *    regardless of input row count. This is exactly how distinct-count
  *    rollups stay cheap at scale: registers merge with MAX, so partial
  *    aggregation does almost all the work before the exchange.
  *  - Bloom: the filter is built distributed (distinct positions), then
  *    carried to the probe side as a LITERAL bitmask — the probe is a
  *    map-side codegen'd bit test with ZERO shuffle and no join, the
  *    standard "semi-join pushdown" trick for a selective build side.
  *    Build-side cardinality is the broadcast-join regime (the mask is
  *    m bits; positions collected to the driver are <= k·|build|).
  */
object Sketch {

  /** Standard HLL bias constant for m = 64 registers. */
  private val Alpha64 = 0.709

  /** Per-group HyperLogLog registers over md5-hashed keys, m = 64 buckets.
    * Output: (groupCols*, bucket, m_j) with m_j = max rho. The hash is
    * h32 of the key's STRING form (engines disagree on integer binary
    * layouts, never on strings); bucket = h % 64; rho = leading-zero count
    * of the remaining 26 bits + 1 (27 when they are all zero).
    * floor(log2(w)) is exact for w < 2^26 — the IEEE log2 of an integer
    * below 2^26 is more than 2e-8 away from the next integer, far beyond
    * double rounding error. */
  /** The per-row (bucket, rho) pair for `key` — exposed so STREAMING
    * aggregations can compose the same sketch: `groupBy(window, bucket)
    * .agg(max(rho))` is an incremental max, so HLL distinct-counting
    * runs over an unbounded stream with state bounded at 64 registers
    * per open window. */
  def hllBucketRho(key: Column): (Column, Column) = {
    val h = HashFunctions.h32(key.cast("string"))
    val w = floor(h / 64L).cast("long")
    val rho = when(w === 0L, lit(27L))
      .otherwise(lit(26L) - floor(log2(w.cast("double"))).cast("long"))
    ((h % 64L).as("bucket"), rho.as("rho"))
  }

  /** Count-Min sketch counters: `depth` independent permutation hashes
    * ([[HashFunctions.permHash]], the q137 MinHash family — same literal
    * coefficients in the oracle SQL) over `width` buckets each. The
    * sketch is ONE map-side-combinable groupBy whose shuffle carries at
    * most depth x width counter rows regardless of input size — the same
    * registers-not-rows scale shape as HLL. Output: (row, bucket, cnt). */
  def countMin(df: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 256): DataFrame =
    cmProbes(df, keyCol, depth, width)
      .groupBy("row", "bucket").agg(count(lit(1)).as("cnt"))

  /** The (key, row, bucket) probe rows shared by build and estimate —
    * the key's md5 hash is materialized once, not once per depth row. */
  private def cmProbes(df: DataFrame, keyCol: String,
                       depth: Int, width: Int): DataFrame = {
    val hashed = df.select(col(keyCol),
      HashFunctions.h32(col(keyCol).cast("string")).as("_h"))
    hashed.select(col(keyCol), explode(array((0 until depth).map { k =>
        struct(lit(k).as("row"),
          (HashFunctions.permHash(k, col("_h")) % width).as("bucket"))
      }: _*)).as("_rb"))
      .select(col(keyCol), col("_rb.row").as("row"), col("_rb.bucket").as("bucket"))
  }

  /** Point-frequency estimates from a Count-Min sketch: for each distinct
    * key in `keys`, min over its depth counters — the classic
    * never-underestimates bound (every counter the key touches contains
    * its true count plus non-negative collision mass). The sketch side is
    * depth x width rows, so the join broadcasts. */
  def cmEstimates(sketch: DataFrame, keys: DataFrame, keyCol: String,
                  depth: Int = 4, width: Int = 256): DataFrame =
    cmProbes(keys, keyCol, depth, width).distinct()
      .join(broadcast(sketch), Seq("row", "bucket"))
      .groupBy(col(keyCol)).agg(min(col("cnt")).as("cm_est"))

  def hllRegisters(df: DataFrame, keyCol: String, groupCols: Seq[String]): DataFrame = {
    val (bucket, rho) = hllBucketRho(col(keyCol))
    df.select((groupCols.map(col) :+ bucket :+ rho): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("rho")).as("m_j"))
  }

  /** Per-group HLL distinct-count estimate from [[hllRegisters]].
    * Z = (64 - present) + Σ 2^-m_j is EXACT in double regardless of sum
    * order (all terms are multiples of 2^-27, total < 64 → every partial
    * sum fits in 33 significand bits), so the raw estimate
    * α·m²/Z is one correctly-rounded IEEE division — engine-stable. The
    * small-range linear-counting correction (E ≤ 2.5m and empty buckets
    * exist) applies m·ln(m/V); ln is the one step trusted only to the
    * engines' shared libm — acceptable under the inventory's ROUND(x,4)
    * contract. */
  def hllEstimate(df: DataFrame, keyCol: String, groupCols: Seq[String]): DataFrame =
    hllFinish(hllRegisters(df, keyCol, groupCols), groupCols)

  /** Finish a register relation (groupCols*, bucket, m_j) — whether it
    * came from [[hllRegisters]], a MAX-merge of several register sets, or
    * a streaming sink table — into the per-group estimate. */
  def hllFinish(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) regs.groupBy()
      else regs.groupBy(groupCols.map(col): _*)
    val agg = grouped.agg(
      count(lit(1)).as("present"),
      sum(pow(lit(2.0), -col("m_j"))).as("z_present"))
    val z = (lit(64.0) - col("present")) + col("z_present")
    val raw = lit(Alpha64 * 64.0 * 64.0) / z
    val v = lit(64L) - col("present")
    val est = when(raw <= 2.5 * 64.0 && v > 0L,
      lit(64.0) * log(lit(64.0) * (lit(1.0) / v))).otherwise(raw)
    agg.select((groupCols.map(col) :+ est.as("hll_est")): _*)
  }

  /** Oracle-SQL twin of [[hllEstimate]] (DuckDB dialect), kept beside the
    * Scala so the two formulations cannot drift apart. `keyExpr` must be
    * textual-identical data to the Spark side's key column. */
  def hllEstimateSql(table: String, keyExpr: String, groupCol: String): String =
    s"""WITH h AS (
       |  SELECT $groupCol AS grp,
       |         CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 8)) AS BIGINT) AS h
       |  FROM $table),
       |b AS (
       |  SELECT grp, h % 64 AS bucket, CAST(FLOOR(h / 64) AS BIGINT) AS w FROM h),
       |r AS (
       |  SELECT grp, bucket,
       |         MAX(CASE WHEN w = 0 THEN 27
       |                  ELSE 26 - CAST(FLOOR(LOG2(CAST(w AS DOUBLE))) AS BIGINT)
       |             END) AS m_j
       |  FROM b GROUP BY grp, bucket),
       |e AS (
       |  SELECT grp, COUNT(*) AS present, SUM(POWER(2.0, -m_j)) AS z_present
       |  FROM r GROUP BY grp)
       |SELECT grp,
       |       CASE WHEN (0.709 * 64 * 64) / ((64.0 - present) + z_present) <= 2.5 * 64.0
       |                 AND 64 - present > 0
       |            THEN 64.0 * LN(64.0 * (1.0 / (64 - present)))
       |            ELSE (0.709 * 64 * 64) / ((64.0 - present) + z_present)
       |       END AS hll_est
       |FROM e""".stripMargin

  /** Number of 64-bit words backing an m-bit bloom mask. */
  private def words(mBits: Int): Int = {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")
    mBits / 64
  }

  /** The i-th (1-based) bloom position from an ALREADY md5-hashed key
    * (h32): the permutation family mod m. Split out so a probe over k
    * positions hashes each row once — neither Filter codegen nor HOFs
    * eliminate a repeated md5 subexpression. */
  def bloomPosFromHash(i: Int, h: Column, mBits: Int): Column =
    HashFunctions.permHash(i, h) % mBits

  /** The i-th (1-based) bloom position of a key column: md5-hash then the
    * permutation family, mod m. Shared by build and probe so the two sides
    * cannot disagree. */
  def bloomPos(i: Int, key: Column, mBits: Int): Column =
    bloomPosFromHash(i, HashFunctions.h32(key.cast("string")), mBits)

  /** Build an m-bit bloom mask (k md5-permutation hashes) over `keyCol`,
    * returned as driver-side words. The distinct-position set is computed
    * distributed and only the positions land on the driver — size <=
    * k·|build| ints, the same regime as a broadcast-join build side. */
  def bloomBuild(df: DataFrame, keyCol: String, mBits: Int = 2048, k: Int = 3): Array[Long] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = words(mBits)
    val posArr = array((1 to k).map(i => bloomPos(i, col(keyCol), mBits)): _*)
    val positions = df.select(explode(posArr).as("pos")).distinct()
      .collect().map(_.getLong(0))
    val mask = new Array[Long](w)
    positions.foreach { p =>
      mask(p.toInt / 64) |= (1L << (p.toInt % 64))
    }
    mask
  }

  /** [[bloomProbe]] over a pre-hashed (h32) key column — use when the
    * caller can project the hash once (k bit tests share it instead of
    * re-running md5 per position). */
  def bloomProbeOnHash(h: Column, mask: Array[Long], mBits: Int = 2048, k: Int = 3): Column = {
    require(mask.length == words(mBits), s"mask has ${mask.length} words, want ${words(mBits)}")
    val litMask = typedLit(mask.toSeq)
    (1 to k).map { i =>
      val p = bloomPosFromHash(i, h, mBits)
      val word = element_at(litMask, (p / 64L).cast("int") + 1)
      // call_function: the Scala `shiftright` helper only takes a literal
      // shift; the SQL ShiftRight expression takes a column. Arithmetic
      // shift of a negative word parities to -1/0 — both covered by =!= 0.
      (call_function("shiftright", word, (p % 64L).cast("int")) % 2L) =!= 0L
    }.reduce(_ && _)
  }

  /** Probe column: true iff ALL k positions of `key` are set in `mask` —
    * the map-side pre-filter. Pure literal-array bit arithmetic: no join,
    * no shuffle, stays inside whole-stage codegen. */
  def bloomProbe(key: Column, mask: Array[Long], mBits: Int = 2048, k: Int = 3): Column =
    bloomProbeOnHash(HashFunctions.h32(key.cast("string")), mask, mBits, k)

  /** Oracle-SQL fragment: the i-th bloom position of `keyExpr` (DuckDB).
    * permHash inlined with the same coefficients. */
  def bloomPosSql(i: Int, keyExpr: String, mBits: Int): String = {
    val a = HashFunctions.permA(i)
    val b = HashFunctions.permB(i)
    val p = HashFunctions.P
    s"((CAST(('0x' || substr(md5(CAST($keyExpr AS VARCHAR)), 1, 8)) AS BIGINT) * $a + $b) % $p) % $mBits"
  }
}
