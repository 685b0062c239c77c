package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Protocol-shaped DynamoDB parallel-scan boundary — the local fake plus
  * the throttled paging client that the reference full-load job runs
  * against the real service (`lib/glue_jobs/ddb_full_load.py:56-65`:
  * `Scan(Segment=i, TotalSegments=n)` paging via `ExclusiveStartKey`,
  * rate-limited to the 120 % read-capacity budget at `:61`, under an
  * STS-assumed role at `:63`). The network client cannot exist in this
  * zero-egress environment, so everything AROUND the socket is real:
  * segment/page iteration, capacity accounting, rate limiting, and the
  * credential injection point — a boto3-backed implementation replaces
  * [[FakeDynamoTable.scan]]'s body and nothing else. */
object DynamoFake {

  /** STS-style short-lived credential. The fake validates expiry the way
    * the service validates a session token, so a client that fails to
    * refresh mid-scan fails loudly here too. */
  final case class Credential(token: String, expiresAtMs: Long)

  /** The injection point (`ddb_full_load.py:63` assumes a role and
    * builds its client from the returned session): called on executors
    * whenever the held credential is expired or absent. Implementations
    * must be serializable (they ride the task closure). */
  trait CredentialProvider extends Serializable {
    def fetch(): Credential
  }

  /** Fixed-lifetime provider — the STS stand-in. */
  final case class StsLikeProvider(lifetimeMs: Long) extends CredentialProvider {
    override def fetch(): Credential = {
      val exp = System.currentTimeMillis() + lifetimeMs
      Credential(s"tok-$exp", exp)
    }
  }

  /** One Scan page: items, the resume key (None = segment exhausted),
    * and the read capacity the page consumed (eventually-consistent
    * scan: half an RCU per 4 KB read, rounded up per page). */
  final case class ScanPage(items: Seq[Row], lastEvaluatedKey: Option[Long],
                            consumedRcu: Double)

  val itemSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Local table fake speaking the Scan protocol: `totalRows` synthetic
    * items, hash-striped across segments (ids ≡ segment mod total, the
    * same disjoint covering the service guarantees), paged by
    * `ExclusiveStartKey`, each item ~`itemBytes` on the wire. Rejects
    * expired credentials like the service rejects a stale session
    * token. */
  final case class FakeDynamoTable(totalRows: Long, itemBytes: Int = 1024,
                                   pageItems: Int = 100) extends Serializable {
    def scan(segment: Int, totalSegments: Int, exclusiveStartKey: Option[Long],
             credential: Credential): ScanPage = {
      require(segment >= 0 && segment < totalSegments,
        s"segment $segment out of range for $totalSegments")
      require(credential.expiresAtMs > System.currentTimeMillis(),
        s"ExpiredTokenException: credential ${credential.token} has expired")
      val from = exclusiveStartKey.map(_ + totalSegments.toLong)
        .getOrElse(segment.toLong)
      val ids = (from until totalRows by totalSegments.toLong)
        .take(pageItems).toVector
      val last = if (ids.nonEmpty &&
        ids.last + totalSegments.toLong < totalRows) Some(ids.last) else None
      val bytes = ids.size.toLong * itemBytes
      ScanPage(ids.map(id => Row(id, s"p$id")), last,
        math.ceil(bytes / 4096.0) * 0.5)
    }
  }

  /** The throttled paging client as a [[SegmentedScan]]: pages one
    * segment via `ExclusiveStartKey`, refreshing the credential whenever
    * it nears expiry, and PACES itself so the whole fleet's consumed
    * capacity stays at `budgetFraction` (the reference's 1.2) of
    * `provisionedRcu` — each of the `totalSegments` workers takes an
    * equal share and sleeps whenever its own consumption runs ahead of
    * its share's allowance, exactly the guardrail that keeps a full
    * table export from starving the live application's reads. */
  final case class ThrottledDynamoScan(table: FakeDynamoTable,
                                       provisionedRcu: Double,
                                       budgetFraction: Double = 1.2,
                                       credentials: CredentialProvider =
                                         StsLikeProvider(lifetimeMs = 3600000L))
      extends SegmentedScan {
    require(provisionedRcu > 0, s"provisionedRcu must be positive: $provisionedRcu")
    require(budgetFraction > 0, s"budgetFraction must be positive: $budgetFraction")

    override def schema: StructType = DynamoFake.itemSchema

    override def scanSegment(segment: Int, totalSegments: Int): Iterator[Row] = {
      val perWorkerRcuPerSec = provisionedRcu * budgetFraction / totalSegments
      new Iterator[Row] {
        private var cred: Credential = null
        private var page: ScanPage = null
        private var idx = 0
        private var done = false
        private var startKey: Option[Long] = None
        private var consumed = 0.0
        private val t0 = System.nanoTime()

        private def freshCred(): Credential = {
          // refresh with headroom: a token that would expire mid-request
          // is as bad as an expired one
          if (cred == null ||
              cred.expiresAtMs - System.currentTimeMillis() < 50L)
            cred = credentials.fetch()
          cred
        }

        private def fetchPage(): Unit = {
          page = table.scan(segment, totalSegments, startKey, freshCred())
          idx = 0
          consumed += page.consumedRcu
          startKey = page.lastEvaluatedKey
          if (page.lastEvaluatedKey.isEmpty && page.items.isEmpty) done = true
          // RATE LIMIT: never let cumulative consumption outrun this
          // worker's capacity share — sleep off any surplus before the
          // caller sees the page (the py:61 throttle, per worker)
          val allowedElapsed = consumed / perWorkerRcuPerSec
          val actualElapsed = (System.nanoTime() - t0) / 1e9
          val aheadMs = ((allowedElapsed - actualElapsed) * 1000.0).toLong
          if (aheadMs > 0L) Thread.sleep(aheadMs)
        }

        override def hasNext: Boolean = {
          while (!done && (page == null || idx >= page.items.size)) {
            if (page != null && page.lastEvaluatedKey.isEmpty) { done = true }
            else fetchPage()
          }
          !done && idx < page.items.size
        }

        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          val r = page.items(idx); idx += 1; r
        }
      }
    }
  }
}
