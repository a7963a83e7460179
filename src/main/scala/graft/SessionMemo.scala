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
    entries.computeIfAbsent((s, dir), _ => build)
  }

  def clear(): Unit = entries.clear()
}
