package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Socket sink (reference `connector-socket`, sink/SocketClient.java:55 —
  * one TCP client per writer, rows serialized as JSON lines
  * (SocketSinkWriter.java:36 JsonSerializationSchema), connect retried
  * `max_retries` times (default 3, SocketSinkConfigOptions) with a 500 ms
  * delay, and a failed write retried once over a fresh connection).
  *
  * Spark-first split of the work: serialization happens IN THE PLAN —
  * `to_json(struct(*))` is a codegen'd projection, so executors stream
  * ready-made lines and the per-partition writer below is pure I/O (the
  * reference serializes row-at-a-time inside the writer). One connection
  * per partition = one per concurrent task, the analogue of the
  * reference's one-client-per-subtask.
  */
object SocketSink {

  case class Config(host: String, port: Int, maxRetries: Int = 3,
      retryDelayMs: Long = 500L)

  /** Batch write: every row as one JSON line. */
  def write(df: DataFrame, cfg: Config): Unit =
    df.select(to_json(struct(df.columns.map(col): _*)).as("payload"))
      .foreachPartition { rows: Iterator[Row] =>
        if (rows.nonEmpty) writePartition(rows.map(_.getString(0)), cfg)
      }

  /** Streaming write via foreachBatch — the reference's streaming sink is
    * the same client fed per checkpointed batch.
    */
  def writeStream(df: DataFrame, cfg: Config, checkpoint: String,
      queryName: String = "graft-socket-sink")
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) => write(batch, cfg) }
      .start()

  private def connectWithRetry(cfg: Config): java.net.Socket = {
    var attempt = 0
    while (true) {
      try {
        val s = new java.net.Socket()
        s.setKeepAlive(true)
        s.setTcpNoDelay(true)
        s.connect(new java.net.InetSocketAddress(cfg.host, cfg.port), 10000)
        return s
      } catch {
        case e: java.io.IOException =>
          attempt += 1
          if (attempt > cfg.maxRetries) throw e
          Thread.sleep(cfg.retryDelayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private[graft] def writePartition(lines: Iterator[String], cfg: Config): Unit = {
    var socket = connectWithRetry(cfg)
    var out = socket.getOutputStream
    try {
      lines.foreach { line =>
        val bytes = (line + "\n").getBytes("UTF-8")
        // write+flush PER ROW, the reference SocketClient contract: every
        // already-written line has left this process before the next one
        // starts, so the reconnect path below replaying only the CURRENT
        // line is lossless — buffering across rows would silently drop the
        // unflushed tail on a mid-partition reconnect (ADVICE r11).
        try { out.write(bytes); out.flush() }
        catch { case _: java.io.IOException =>
          // reference SocketClient: reconnect once and replay the row
          try socket.close() catch { case _: java.io.IOException => () }
          socket = connectWithRetry(cfg)
          out = socket.getOutputStream
          out.write(bytes); out.flush()
        }
      }
    } finally socket.close()
  }
}
