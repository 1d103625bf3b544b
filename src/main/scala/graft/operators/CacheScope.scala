package graft.operators

import org.apache.spark.sql.DataFrame
import scala.collection.mutable.ArrayBuffer

/** Persist/unpersist discipline for operators that must cache intermediate
  * tables (the dedup/LSH signature tables feeding self-joins — Spark does
  * not reuse exchanges across differently-aliased self-join sides, so the
  * cache is load-bearing, not an optimization).
  *
  * Operators call [[track]] instead of `.cache()`. A caller that consumes
  * the result eagerly wraps build-and-consume in [[scoped]]:
  *
  * {{{
  *   CacheScope.scoped {
  *     Dedup.minhashLshPairs(docs, "id", "text").count()
  *   } // signature caches are unpersisted here
  * }}}
  *
  * Outside any scope, [[track]] degrades to plain `.persist()` (session-LRU
  * lifetime, the pre-scope behavior) so lazily-consumed results still work.
  * Scopes nest: each scope unpersists exactly the caches created inside it.
  * The scope is thread-local — build and consume on the same thread (Spark
  * executes the job's tasks on the pool regardless; only the driver-side
  * action call must stay in the scope's thread).
  */
object CacheScope {

  private val current = new ThreadLocal[ArrayBuffer[DataFrame]]()

  /** Persist `df` and register it with the active scope (if any). */
  def track(df: DataFrame): DataFrame = {
    df.persist()
    val buf = current.get()
    if (buf != null) buf += df
    df
  }

  /** Run `f`; afterwards unpersist every DataFrame tracked inside it. */
  def scoped[T](f: => T): T = {
    val outer = current.get()
    val buf = ArrayBuffer.empty[DataFrame]
    current.set(buf)
    try f
    finally {
      buf.foreach(_.unpersist(blocking = false))
      if (outer != null) current.set(outer) else current.remove()
    }
  }
}
