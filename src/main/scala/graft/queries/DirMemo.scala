package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-keyed compute-once memo for per-dir derived frames (propagated
  * dup-cluster labels, brute-force ANN ground truth): several queries are
  * small rollups over ONE expensive shared frame, and recomputing it per
  * query dominated the bench (5.3 s for the label frame alone in round 8;
  * ~18 s of redundant brute-force top-k across the four recall queries in
  * round 9).
  *
  * Keys include the owning [[SparkSession]] (not just its SparkContext:
  * a DataFrame is resolved against the session that built it — UDF
  * registrations, conf — so sibling sessions sharing one context via
  * `spark.newSession` must not share memo hits). A second session in the
  * same JVM (test suites, embedded use) simply misses and recomputes.
  * Entries whose underlying context is stopped
  * are purged opportunistically on every access, and [[clear]] gives
  * long-running services / bench teardown an explicit eviction point, so
  * blocks are never pinned for the JVM lifetime.
  *
  * The testdata under a dir is immutable for a round, so a hit can never
  * serve stale results; [[invalidate]] covers callers that mutate a dir.
  */
private[graft] object DirMemo {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private def purgeStopped(): Unit = {
    val it = m.keySet().iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
  }

  /** Memoized `compute` under (session, kind, dir); `kind` namespaces the
    * independent memo families.
    */
  def getOrCompute(kind: String, spark: SparkSession, dir: String)
                  (compute: => DataFrame): DataFrame = {
    purgeStopped()
    val key = (spark, kind, dir)
    val cached = m.get(key)
    if (cached != null) cached
    else {
      val v = compute
      m.put(key, v)
      v
    }
  }

  /** Replace the memo entry with a freshly computed frame (bench paths that
    * must keep the shared work visible round-over-round).
    */
  def putFresh(kind: String, spark: SparkSession, dir: String,
               value: DataFrame): DataFrame = {
    purgeStopped()
    m.put((spark, kind, dir), value)
    value
  }

  def invalidate(kind: String, spark: SparkSession, dir: String): Unit =
    m.remove((spark, kind, dir))

  /** Drop every entry. Checkpoint/cache blocks behind evicted frames are
    * released lazily by Spark's ContextCleaner once the frames are
    * unreachable; callers needing eager release should unpersist before
    * clearing.
    */
  def clear(): Unit = m.clear()

  private[graft] def size: Int = m.size()
}
