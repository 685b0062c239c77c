package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.operators.FullLoad
import graft.sources.DynamoFake._

/** The DynamoDB-protocol scan boundary: segment/page iteration covers
  * every item exactly once, the 120 % capacity throttle actually paces
  * the fleet, and the STS-style credential seam refreshes mid-scan. */
class DynamoFakeSpec extends SparkSpec {
  import spark.implicits._

  test("paging covers every item exactly once, bounded pages, any segment count") {
    val t = FakeDynamoTable(totalRows = 1037L, pageItems = 50)
    for (total <- Seq(1, 3, 8)) {
      val ids = (0 until total).flatMap { seg =>
        var key: Option[Long] = None
        var out = Vector.empty[Long]
        var done = false
        while (!done) {
          val p = t.scan(seg, total, key,
            Credential("tok", System.currentTimeMillis() + 60000L))
          assert(p.items.size <= 50, "page exceeded its size bound")
          out ++= p.items.map(_.getLong(0))
          key = p.lastEvaluatedKey
          done = key.isEmpty
        }
        out
      }
      assert(ids.sorted === (0L until 1037L).toVector,
        s"segments of $total did not cover the table exactly once")
    }
  }

  test("an expired credential is rejected like the service rejects a stale token") {
    val t = FakeDynamoTable(totalRows = 10L)
    intercept[IllegalArgumentException] {
      t.scan(0, 1, None, Credential("tok", System.currentTimeMillis() - 1L))
    }
  }

  test("FullLoad.runScan end-to-end over the protocol fake lands every row") {
    val dest = java.nio.file.Files.createTempDirectory("graft_ddb").toString + "/t"
    val scan = ThrottledDynamoScan(
      FakeDynamoTable(totalRows = 5000L, pageItems = 500),
      provisionedRcu = 1e9) // effectively unthrottled
    FullLoad.runScan(spark, scan, splits = 4, destPath = dest,
      outputPartitions = 2)
    val got = FullLoad.readBack(spark, dest).select($"id").as[Long]
      .collect().sorted
    assert(got.toSeq === (0L until 5000L).toSeq, "full load lost or duplicated rows")
  }

  test("the 120% capacity budget paces the scan — consumption cannot outrun the share") {
    // 1000 items x 4096 B in 100-item pages = 50 RCU per page, 10 pages
    // = 500 RCU total over 2 segments -> 250 RCU per worker. With
    // provisioned=200 and the 1.2 budget, each worker's share is
    // 200*1.2/2 = 120 RCU/s -> the fleet needs >= ~2.1 s. Assert a
    // conservative floor (and correctness), not an exact time.
    val t = FakeDynamoTable(totalRows = 1000L, itemBytes = 4096, pageItems = 100)
    val scan = ThrottledDynamoScan(t, provisionedRcu = 200.0)
    val t0 = System.nanoTime()
    val dest = java.nio.file.Files.createTempDirectory("graft_ddb_thr").toString + "/t"
    FullLoad.runScan(spark, scan, splits = 2, destPath = dest, outputPartitions = 1)
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(FullLoad.readBack(spark, dest).count() === 1000L)
    assert(elapsed >= 1.5,
      f"throttle did not pace the scan: finished in $elapsed%.2f s (floor ~2.1 s)")
  }

  test("the credential seam refreshes mid-scan when the STS lifetime is short") {
    val fetches = new AtomicInteger(0)
    // tokens live 300 ms; the throttle stretches the scan past several
    // lifetimes, so the client MUST re-fetch to finish (local[?] keeps
    // the counter in-process)
    val counting = new CredentialProvider {
      override def fetch(): Credential = {
        fetches.incrementAndGet()
        Credential(s"tok-${fetches.get}", System.currentTimeMillis() + 300L)
      }
    }
    val t = FakeDynamoTable(totalRows = 250L, itemBytes = 4096, pageItems = 50)
    val scan = ThrottledDynamoScan(t, provisionedRcu = 100.0,
      credentials = counting)
    // one worker: 125 RCU at 100*1.2=120 RCU/s share -> ~1 s of paging,
    // several 300 ms token lifetimes deep
    val rows = scan.scanSegment(0, 1).size
    assert(rows === 250)
    assert(fetches.get >= 2,
      s"scan outlived the token lifetime but never refreshed (${fetches.get} fetches)")
  }
}
