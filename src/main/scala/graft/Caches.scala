package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-keyed registry for builder-internal `persist()` calls.
  *
  * Several api-layer builders persist an intermediate frame that feeds
  * multiple consumers inside ONE returned plan (a token-hash table read
  * from both self-join sides, an exploded postings table feeding three
  * stages). The builder cannot unpersist it — the consuming action runs
  * later, in the caller — so an untracked `persist()` would pin executor
  * storage until GC-driven ContextCleaner reclaim, accumulating per
  * invocation in a long-lived session. Builders therefore persist via
  * [[persistTracked]], and hosts release a session's entire working set
  * with [[clear]] (Verify/Bench do, via
  * [[graft.operators.TextQueries.clearCaches]]).
  */
object Caches {

  private val tracked =
    new ConcurrentHashMap[SparkSession, java.util.List[DataFrame]]()

  /** Persist `df` and register it for session-scoped release. Returns
    * `df` for chaining. */
  def persistTracked(df: DataFrame): DataFrame = {
    df.persist()
    tracked
      .computeIfAbsent(df.sparkSession,
        _ => java.util.Collections.synchronizedList(
          new java.util.ArrayList[DataFrame]()))
      .add(df)
    df
  }

  /** Unpersist every frame registered under `s` and drop the session's
    * registry entry (blocking=false — reclaim proceeds async). */
  def clear(s: SparkSession): Unit = {
    val l = tracked.remove(s)
    if (l != null) l.forEach(df => { df.unpersist(); () })
  }
}
