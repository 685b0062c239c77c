package graft

/** SessionCache must key on the session OBJECT: distinct sessions (even
  * within one SparkContext) never share entries — the collision mode the
  * old identityHashCode-string keying allowed — while repeated lookups
  * from the same session hit the memo. */
class SessionCacheSpec extends SparkSpec {

  test("keys by session object: same session hits, sibling session misses") {
    val cache = new SessionCache[Int]
    var computes = 0
    def get(s: org.apache.spark.sql.SparkSession) =
      cache.getOrElseUpdate(s, "k") { computes += 1; computes }
    val s1 = spark.newSession()
    assert(get(s1) === 1)
    assert(get(s1) === 1, "same session should hit the cached value")
    val s2 = spark.newSession()
    assert(get(s2) === 2, "a sibling session must not see s1's entry")
    assert(get(s1) === 1, "s1's entry survives s2's insert")
    assert(computes === 2)
  }

  test("distinct per-key values within one session") {
    val cache = new SessionCache[String]
    val s1 = spark.newSession()
    assert(cache.getOrElseUpdate(s1, "a")("va") === "va")
    assert(cache.getOrElseUpdate(s1, "b")("vb") === "vb")
    assert(cache.getOrElseUpdate(s1, "a")(sys.error("must not recompute")) === "va")
  }
}
