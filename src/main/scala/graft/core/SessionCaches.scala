package graft.core

import org.apache.spark.sql.SparkSession

/** Hygiene for the process-level `(SparkSession, …)`-keyed caches the
  * shared-frame pattern uses (sharedMinhashCandidates, sharedPqIndex,
  * the m14/m16 snapshot fixtures, …): entries keyed by a STOPPED
  * session are dead weight — their DataFrames are unusable and the key
  * pins the session, its Snapshots fixtures, and scratch dirs for the
  * JVM lifetime. Callers invoke [[prune]] before `computeIfAbsent`, so
  * a long-running or multi-session driver's caches track live sessions
  * instead of growing monotonically. O(cache size) `isStopped` flag
  * reads — trivial next to the build the cache avoids. */
object SessionCaches {
  def prune[K, V](
      m: java.util.concurrent.ConcurrentHashMap[(SparkSession, K), V]): Unit =
    m.keySet.removeIf(_._1.sparkContext.isStopped)
}
