package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults chosen for correctness + scale (SURVEY.md §7.1 M0):
  *   - UTC session time zone (deterministic timestamp semantics vs the
  *     DuckDB oracle; deviation from the reference's naive local clock,
  *     `resources/firehose_transformation.py:19`, documented SURVEY §7.4).
  *   - AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  *     and dynamic broadcast — the scale levers we rely on at 100 TB.
  *   - shuffle.partitions sized to the local core count here; on a real
  *     cluster this is overridden to ~2-3x total executor cores (AQE
  *     coalesces the excess).
  *   - Nanosecond parquet timestamps read as long (the driver testdata's
  *     `events.ts` is timestamp[ns]; Spark has no nanos TimestampType).
  *     [[graft.sources.Tables]] converts to microsecond TimestampType,
  *     matching DuckDB's truncation of the same file.
  */
object GraftSession {

  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def builder(master: String = s"local[$cpus]",
              shufflePartitions: Int = cpus): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      // the lake catalog: SQL `CREATE TABLE graft.ns.t`, INSERT, DELETE,
      // VERSION/TIMESTAMP AS OF over txlog zones out of the box; the
      // warehouse defaults under spark.sql.warehouse.dir/graft and is
      // overridden per deployment via spark.sql.catalog.graft.warehouse
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.ui.enabled", "false")
      // Long drives (a full bench is ~1000 query executions in one JVM)
      // otherwise accumulate per-execution status data — the SQL status
      // store keeps each execution's physical-plan description string
      // (default cap 1000 executions; some of our plans stringify to
      // MBs), and the app status store keeps per-job/stage/task rows.
      // These caps bound that to a fixed few-hundred-MB ceiling; they do
      // not affect query execution, only post-hoc introspection depth.
      .config("spark.sql.ui.retainedExecutions", "50")
      .config("spark.ui.retainedJobs", "200")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "10000")
      .config("spark.ui.dagGraph.retainedRootRDDs", "100")
      .withExtensions(new graft.plans.GraftExtensions)

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.registerAll(spark)
    spark
  }

  /** Apply graft defaults to an externally created session (e.g. the
    * driver-owned sessions in Verify/Bench which pick their own master). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark
  }
}
