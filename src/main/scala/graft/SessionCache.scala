package graft

import org.apache.spark.sql.SparkSession

/** Per-SparkSession memo for expensive derived state (checkpointed
  * relations, trained centroids), keyed by the session OBJECT — not by
  * `System.identityHashCode`, which is not unique: a hash collision
  * between a stopped session and a new one would serve the dead
  * session's checkpoint RDDs to the live one. Object keying makes that
  * collision impossible.
  *
  * Growth is bounded two ways. Sessions whose SparkContext has stopped
  * are swept on every lookup (their cached plans are unusable anyway),
  * and the map is LRU-capped at `maxSessions` — an evicted session's
  * values simply recompute on next use. A weak map is deliberately NOT
  * used: most cached values are DataFrames, which strongly reference
  * their session, so WeakHashMap entries whose values point back at the
  * key would never be collected (the classic value→key leak). */
private[graft] final class SessionCache[V](maxSessions: Int = 8) {
  private val bySession =
    new java.util.LinkedHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[String, V]](16, 0.75f,
        /*accessOrder=*/ true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession,
            scala.collection.concurrent.TrieMap[String, V]]): Boolean =
        size() > maxSessions
    }

  def getOrElseUpdate(s: SparkSession, key: String)(v: => V): V = {
    val inner = bySession.synchronized {
      val it = bySession.keySet().iterator()
      while (it.hasNext) if (it.next().sparkContext.isStopped) it.remove()
      var m = bySession.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, V]
        bySession.put(s, m)
      }
      m
    }
    inner.getOrElseUpdate(key, v)
  }
}
