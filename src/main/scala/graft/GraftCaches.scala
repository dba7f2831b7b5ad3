package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Registry of the persisted intermediates graft operators create (dedup
  * band/shingle tables, dead-letter parses, ...).
  *
  * The dedup family persists multi-use intermediates because Spark reuses
  * no subplans across self-joins — but those caches outlive the query that
  * built them, and in a long-lived session running many pipelines LRU
  * eviction is the only thing bounding them. Operators register every
  * persist here; hosts (Verify/Bench between driver queries,
  * [[graft.api.Pipeline]] at job end, user code via `releaseAll`) drop
  * them once the query's results are materialized. Release is safe at any
  * point — an unpersisted intermediate degrades to a rescan, never an
  * error.
  *
  * Tracking is SCOPED: each pipeline run registers its intermediates in
  * its own [[Scope]] (carried in a thread-local while the job's plan is
  * built), so concurrent pipelines in one session cannot release each
  * other's caches. Code outside any scope lands in the session-global
  * default scope, which `releaseAll` drains.
  */
object GraftCaches {

  /** A releasable set of tracked intermediates (one pipeline run). */
  final class Scope {
    private[GraftCaches] val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    private[GraftCaches] def add(df: DataFrame, level: StorageLevel): DataFrame =
      synchronized {
        live += df
        df.persist(level)
      }

    /** Unpersist every intermediate tracked by THIS scope and forget
      * them; other scopes are untouched. Non-blocking by default (a
      * pipeline moving to its next job shouldn't wait on block eviction);
      * `blocking = true` waits until the blocks are actually gone — the
      * bench host uses it so eviction work never bleeds into the next
      * query's timed reps.
      */
    def release(blocking: Boolean = false): Unit = synchronized {
      live.foreach(df => df.unpersist(blocking))
      live.clear()
    }

    /** Number of tracked (not yet released) intermediates — for specs. */
    def trackedCount: Int = synchronized(live.size)
  }

  private val global = new Scope
  private val current = new ThreadLocal[Scope] {
    override def initialValue(): Scope = global
  }

  /** A fresh scope; pair with [[inScope]] and `scope.release()`. */
  def newScope(): Scope = new Scope

  /** Run `f` with `scope` receiving this thread's persist registrations. */
  def inScope[T](scope: Scope)(f: => T): T = {
    val prev = current.get()
    current.set(scope)
    try f finally current.set(prev)
  }

  /** Persist `df` at `level` and track it in the current scope. */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame =
    current.get().add(df, level)

  /** Release the session-global default scope (hosts like Verify/Bench
    * call this between queries; scoped pipelines release their own).
    */
  def releaseAll(spark: SparkSession, blocking: Boolean = false): Unit =
    global.release(blocking)

  /** Tracked count of the session-global default scope — for specs. */
  def trackedCount: Int = global.trackedCount

  /** `df.graftPersist` — persist + track in one call. */
  implicit class PersistOps(private val df: DataFrame) extends AnyVal {
    def graftPersist: DataFrame = GraftCaches.persist(df)
  }
}
