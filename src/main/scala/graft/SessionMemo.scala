package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped DataFrame memo for checkpointed artifacts (C6 cluster
  * assignment, B7/B8/B9 PQ corpus codes). Keyed by (session, table dir);
  * the first use per session registers a listener that drops all of that
  * session's entries when its SparkContext ends, so a stopped session —
  * and the localCheckpoint blocks its entries pin — is never kept alive
  * by the memo.
  *
  * The memo cannot observe filesystem rewrites: rebuilding a corpus
  * under the SAME dir within one session requires an explicit
  * [[clear]] (exposed per-operator as `invalidateClusterArtifacts` /
  * `invalidatePqArtifacts`), otherwise the memo serves the stale
  * artifact.
  */
final class SessionMemo {
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val hooked =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  def getOrElseUpdate(s: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          entries.keySet.removeIf(_._1 eq s)
          hooked.remove(s)
        }
      })
    }
    // NOT computeIfAbsent: an artifact's build may itself consult this
    // memo (r12's PQ variant family — codes build → codebook build, same
    // map), and a nested computeIfAbsent on one ConcurrentHashMap throws
    // "Recursive update" whenever the two keys share a bin — a
    // hash-dependent landmine the NullInputSpec tripped. Build OUTSIDE
    // the map lock; a concurrent duplicate build is deterministic and
    // putIfAbsent keeps exactly one (the loser's checkpoint idles until
    // session end — waste, never wrongness).
    val key = (s, dir)
    val existing = entries.get(key)
    if (existing != null) existing
    else {
      val built = build
      val prev = entries.putIfAbsent(key, built)
      if (prev != null) prev else built
    }
  }

  def clear(): Unit = entries.clear()
}
