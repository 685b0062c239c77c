package graft

import org.apache.spark.sql.SparkSession

/** Per-SparkSession memo for expensive derived state (checkpointed
  * relations, trained centroids), keyed by the session OBJECT — not by
  * `System.identityHashCode`, which is not unique: a hash collision
  * between a stopped session and a new one would serve the dead
  * session's checkpoint RDDs to the live one. A `WeakHashMap` compares
  * `SparkSession` keys by reference identity (no `equals` override) and
  * drops an entry when its session becomes unreachable, so abandoned
  * sessions stop pinning their cached values for the JVM lifetime.
  * A session observed stopped is evicted eagerly on the next lookup. */
private[graft] final class SessionCache[V] {
  private val bySession =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, V]]()

  def getOrElseUpdate(s: SparkSession, key: String)(v: => V): V = {
    val inner = bySession.synchronized {
      if (s.sparkContext.isStopped) bySession.remove(s)
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
