package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of the persisted intermediates graft operators
  * create (dedup band/shingle tables, dead-letter parses, ...).
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
  */
object GraftCaches {

  private val live = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist `df` at `level` and track it for later release. */
  def persist(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = synchronized {
    live += df
    df.persist(level)
  }

  /** Unpersist every tracked intermediate of `spark`'s shared cache state
    * (non-blocking) and forget them all.
    */
  def releaseAll(spark: SparkSession): Unit = synchronized {
    live.foreach(df => df.unpersist(blocking = false))
    live.clear()
  }

  /** Number of tracked (not yet released) intermediates — for specs. */
  def trackedCount: Int = synchronized(live.size)

  /** `df.graftPersist` — persist + track in one call. */
  implicit class PersistOps(private val df: DataFrame) extends AnyVal {
    def graftPersist: DataFrame = GraftCaches.persist(df)
  }
}
