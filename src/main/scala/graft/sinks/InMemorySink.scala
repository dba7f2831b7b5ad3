package graft.sinks

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.Row

/** The reference's e2e test sink (`seatunnel-e2e-common/.../sink/inmemory/
  * InMemorySinkWriter.java:81-107`): collects rows into a process-local
  * store and injects failures on demand —
  *   - `throw_exception`        prepareCommit sleeps 4s then IOExceptions
  *                              ("write failed"), failing the job;
  *   - `throw_out_of_memory`    write throws OutOfMemoryError;
  *   - `checkpoint_sleep`       commits are slowed 5s but succeed;
  *   - `throw_runtime_exception_list`  the Nth job attempt throws the Nth
  *                              listed message (restoreCount in the
  *                              reference), so restart/retry behavior is
  *                              observable across recoveries.
  *
  * Spark mapping: failures are raised inside the foreachBatch callback
  * (driver-side, on the stream-execution thread) AFTER the batch's rows
  * land in the store — the job-level observable the reference's engine
  * ITs assert (job fails / retries / survives slow checkpoints).
  */
object InMemorySink {
  private val store = new ConcurrentHashMap[String, Vector[Row]]()
  private val attempts = new ConcurrentHashMap[String, AtomicInteger]()

  def rows(key: String): Vector[Row] = store.getOrDefault(key, Vector.empty)

  def append(key: String, rs: Seq[Row]): Unit =
    store.merge(key, rs.toVector, (a, b) => a ++ b)

  /** 0-based attempt counter per store key — one tick per micro-batch
    * attempt, the Spark analog of the reference's per-restore counter.
    */
  def nextAttempt(key: String): Int =
    attempts.computeIfAbsent(key, _ => new AtomicInteger(0)).getAndIncrement()

  def reset(key: String): Unit = { store.remove(key); attempts.remove(key); () }
}
