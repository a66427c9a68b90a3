package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry for per-query scratch caches.
  *
  * Query functions cache intermediate frames that are reused WITHIN
  * one query's plan (shingle sets, signature bands, embedding bases).
  * Those caches must not outlive the query: in a long-lived session
  * serving many queries, leaked caches accumulate in executor storage
  * memory for the JVM lifetime and skew memory pressure at scale.
  *
  * Contract: query builders call [[cached]] instead of `.cache()`;
  * the consumer (bench, verify, an embedding application) calls
  * [[release]] after the terminal action. Frames registered here are
  * query-local by definition — anything meant to be shared across
  * queries should be cached explicitly by the application instead.
  */
object QueryScratch {

  private val reg =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.util.Queue[DataFrame]]()

  /** Cache `df` and register it for release with the current query. */
  def cached(df: DataFrame): DataFrame = {
    df.cache()
    register(df)
  }

  /** Register an ALREADY-cached frame for release (e.g. the surviving
    * frame of an iterative loop that manages its own caching).
    */
  def register(df: DataFrame): DataFrame = {
    reg.computeIfAbsent(df.sparkSession,
      _ => new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()).add(df)
    df
  }

  /** Unpersist every frame registered on `s` since the last release.
    * Non-blocking: eviction proceeds async while the next query plans.
    */
  def release(s: SparkSession): Unit = {
    val q = reg.remove(s)
    if (q != null) q.forEach(df => { df.unpersist(blocking = false); () })
  }
}
