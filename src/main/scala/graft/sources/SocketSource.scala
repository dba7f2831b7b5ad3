package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Socket source (reference `connector-socket`,
  * source/SocketSourceReader.java:66 — connect to host:port, split the
  * byte stream on '\n', strip a trailing '\r', one single-column row per
  * line, field name "value" per SocketSource.java:83).
  *
  * Two Spark-first shapes:
  *   - [[readStream]] — UNBOUNDED: Spark's own TextSocketMicroBatchStream
  *     (`format("socket")`) already implements the reference's streaming
  *     contract (line-split client connection, `value` string column); we
  *     use it as-is rather than re-implementing a DSv2 stream.
  *   - [[readBounded]] — BOUNDED: the reference source is inherently a
  *     SINGLE client connection (AbstractSingleSplitReader — one split,
  *     never parallel), so a driver-side eager read is the honest
  *     distribution story, exactly like [[HttpSource]]'s eager fetch: the
  *     payload is bounded by the protocol's own contract, the connection
  *     closes before the plan runs, and everything downstream is a
  *     distributed DataFrame.
  */
object SocketSource {

  /** Bounded read: connect, consume lines until the server closes the
    * connection (the reference signals no-more-elements after its first
    * drain — EOF is the deterministic form of that bound), return one
    * string row per line as column `value`.
    *
    * `connectTimeoutMs`/`readTimeoutMs` bound a wedged peer; `maxLines`
    * caps runaway servers (the payload is driver-memory by design — a
    * firehose peer belongs on [[readStream]]).
    */
  def readBounded(spark: SparkSession, host: String, port: Int,
      connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 30000,
      maxLines: Int = 1 << 20): DataFrame = {
    val socket = new java.net.Socket()
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      socket.connect(new java.net.InetSocketAddress(host, port), connectTimeoutMs)
      socket.setSoTimeout(readTimeoutMs)
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(socket.getInputStream, "UTF-8"))
      var line = reader.readLine() // readLine strips \n and \r\n (ref contract)
      while (line != null && lines.size < maxLines) {
        lines += line
        line = reader.readLine()
      }
    } finally socket.close()
    import spark.implicits._
    spark.createDataset(lines.toSeq).toDF("value")
  }

  /** Unbounded read: Spark's built-in socket streaming source — one
    * micro-batched `value` string column off a live host:port connection.
    */
  def readStream(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port)
      .load()
}
