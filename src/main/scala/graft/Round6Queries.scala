package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Queries.Q
import graft.operators.TxLog
import graft.sources.Tables

/** Round-6 inventory extension: the transaction-log read path under the
  * hash gate. q156 reads lineitem THROUGH a TxLog zone with typed per-file
  * stats and a date-range predicate, so manifest-based file skipping (the
  * 100 TB difference between scanning 3 files and 800k) is pinned by the
  * same rows+schema+hash oracle as every other operator, not just by unit
  * tests. Reference anchor: the reference lake writes raw hour prefixes
  * with no stats/skipping at all (`lib/dynamodb-streaming-datalake-stack
  * .ts:199-203`), so every reader scans the full zone; this is the
  * engine's answer. */
object Round6Queries {

  /** One TxLog zone per (JVM, sf dir): lineitem clustered by l_shipdate
    * (range partitioning = what turns per-file min/max into a sharp
    * pruning predicate) and committed with typed stats. Built once per
    * process so a bench's timed pass measures the pruned READ, while
    * every fresh JVM (each Verify run) rebuilds from the source parquet —
    * no stale state can leak across driver rounds. */
  private val zones = scala.collection.concurrent.TrieMap.empty[String, String]

  private[graft] def shipdateZone(s: SparkSession, d: String): String =
    zones.getOrElseUpdate(d, {
      val san = d.replaceAll("[^A-Za-z0-9.]", "_")
      val zone = java.nio.file.Files
        .createTempDirectory(s"graft_q156_$san").toString + "/zone"
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_shipdate"))
      TxLog.replace(s, zone,
        li.repartitionByRange(8, col("l_shipdate")),
        statsCols = Seq("l_shipdate"))
      zone
    })

  /** Z-ordered TxLog zone over (l_partkey, l_quantity): clusterByZ makes
    * every file's min/max tight on BOTH columns at once, so q157's
    * conjunctive range read prunes on their intersection. Partkey is
    * bucketed into the z-value's 10-bit budget with a divisor derived
    * from the table's actual max key (Layout.zValue IGNORES bits above
    * 2^bits, so an overflowing bucket id would interleave DISTANT
    * partkeys into the same z-cells — every file's min/max then spans
    * the whole key range and pruning silently degenerates to a full
    * scan at exactly the scale it exists for); quantity fits raw. The
    * floor of 32 keeps the small-sf layout identical to the fixed /32
    * bucketing this query shipped with. */
  private val zZones = scala.collection.concurrent.TrieMap.empty[String, String]
  private[graft] def zorderZone(s: SparkSession, d: String): String =
    zZones.getOrElseUpdate(d, {
      val zone = java.nio.file.Files
        .createTempDirectory("graft_q157").toString + "/zone"
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_quantity"))
      val maxPk = li.agg(max(col("l_partkey")).cast("long")).first().getLong(0)
      val div = math.max(32L, (maxPk >> 10) + 1L) // ceil-ish: maxPk/div < 1024
      val clustered = graft.operators.Layout.clusterByZ(
        li.withColumn("_pb", floor(col("l_partkey") / div)),
        Seq("_pb", "l_quantity"), bits = 10, numFiles = 16).drop("_pb")
      TxLog.replace(s, zone, clustered,
        statsCols = Seq("l_partkey", "l_quantity"))
      zone
    })

  /** Two generations over lineitem split by quantity: gen 1 = the
    * low-quantity rows (replace), gen 2 = gen 1 + the rest (append).
    * q158 reads the PINNED gen-1 snapshot after gen 2 exists — time
    * travel within the vacuum retention window, under the hash gate. */
  private val ttZones = scala.collection.concurrent.TrieMap
    .empty[String, (String, TxLog.Snapshot)]
  private[graft] def timeTravelZone(s: SparkSession, d: String): (String, TxLog.Snapshot) =
    ttZones.getOrElseUpdate(d, {
      val zone = java.nio.file.Files
        .createTempDirectory("graft_q158").toString + "/zone"
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val gen1 = TxLog.replace(s, zone, li.filter(col("l_quantity") <= 25))
      TxLog.append(s, zone, li.filter(col("l_quantity") > 25))
      (zone, gen1)
    })

  def all: Seq[Q] = Seq(

    Q("q156_txlog_pruned_read",
      // the oracle reads the SAME rows straight from the source table —
      // equality proves the zone build + manifest pruning lost nothing
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <= TIMESTAMP '1996-03-31 23:59:59'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => TxLog
        .readWhereCol(s, shipdateZone(s, d), "l_shipdate",
          "1996-01-01 00:00:00", "1996-03-31 23:59:59")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_shipdate"))
        .orderBy("l_orderkey", "l_linenumber")),

    Q("q157_txlog_zorder_pruned",
      // conjunctive range read over the Z-ordered zone: correctness is
      // the plain two-predicate filter; the zone layout + per-column
      // stats intersection is the engine's business (Round6Spec pins
      // that the scan honors the intersected keep-list)
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
             |FROM lineitem
             |WHERE l_partkey BETWEEN 50 AND 120
             |  AND l_quantity BETWEEN 10 AND 20
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => TxLog
        .readWhereCols(s, zorderZone(s, d),
          Seq(("l_partkey", 50, 120), ("l_quantity", 10, 20)))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")),

    Q("q158_txlog_time_travel",
      // the pinned gen-1 snapshot read AFTER gen 2 was published must
      // see exactly the pre-append rows — snapshot isolation / time
      // travel under the hash gate
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
             |FROM lineitem WHERE l_quantity <= 25
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, d) => {
        val (zone, gen1) = timeTravelZone(s, d)
        TxLog.readSnapshot(s, zone, gen1)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy("l_orderkey", "l_linenumber")
      }),

    Q("q159_knn_join",
      // Batch k-NN JOIN: the 20 lowest-id vectors are the query set, the
      // rest the corpus; every query probes its 3 best IVF cells (the
      // shared deterministic k=16 training) and takes exact cosine top-5
      // inside them. Candidates are a cell equi-join — |q|·nProbe·(n/16)
      // rows, never |q|·n — and the oracle replays the identical probe
      // and ranking arithmetic (rounded cosine, lowest-id ties) over the
      // same unrolled k-means CTEs as q69/q140.
      Some(s"""WITH ${ExtendedQueries.kmeansCtePrefix},
              |qs AS (SELECT vec_id AS q_id, embedding AS qe FROM v WHERE vec_id < 20),
              |qprob AS (SELECT q_id, qe, cid FROM (
              |  SELECT q.q_id, q.qe, c.cid,
              |         ROW_NUMBER() OVER (PARTITION BY q.q_id
              |           ORDER BY ROUND(${TrainingQueries.cosOf("q.qe", "c.ce")}, 4) DESC,
              |                    c.cid) AS rn
              |  FROM qs q CROSS JOIN c2 c) r WHERE rn <= 3),
              |cand AS (SELECT p.q_id, p.qe, a.vec_id, a.embedding
              |         FROM qprob p JOIN afinal a ON a.cid = p.cid
              |         WHERE a.vec_id >= 20),
              |ranked AS (SELECT q_id, vec_id,
              |                  ROUND(${TrainingQueries.cosOf("qe", "embedding")}, 4) AS sim,
              |                  CAST(ROW_NUMBER() OVER (PARTITION BY q_id
              |                    ORDER BY ROUND(${TrainingQueries.cosOf("qe", "embedding")}, 4) DESC,
              |                             vec_id) AS BIGINT) AS rank
              |           FROM cand)
              |SELECT q_id, vec_id, sim, rank FROM ranked WHERE rank <= 5
              |ORDER BY q_id, rank""".stripMargin),
      (s, d) => {
        import graft.operators.Similarity
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
        val corpus = emb.filter(col("vec_id") >= 20)
        Similarity.knnJoinIvf(corpus, queries,
            ExtendedQueries.trainedCentroids16(s, d), k = 5, nProbe = 3)
          .orderBy("q_id", "rank")
      })
  )
}
