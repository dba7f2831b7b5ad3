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
    var truncated = false
    try {
      socket.connect(new java.net.InetSocketAddress(host, port), connectTimeoutMs)
      socket.setSoTimeout(readTimeoutMs)
      val reader = new java.io.InputStreamReader(socket.getInputStream, "UTF-8")
      // Split on '\n' ONLY, stripping one trailing '\r' — the exact
      // SocketSourceReader.pollNext contract. BufferedReader.readLine would
      // additionally treat a lone '\r' as a terminator, turning the
      // reference's one row "a\rb" into two (ADVICE r11).
      val sb = new java.lang.StringBuilder
      val buf = new Array[Char](8192)
      var n = reader.read(buf)
      var done = false
      while (n >= 0 && !done) {
        var i = 0
        while (i < n && !done) {
          val c = buf(i)
          if (c == '\n') {
            val len = sb.length
            if (len > 0 && sb.charAt(len - 1) == '\r') sb.setLength(len - 1)
            lines += sb.toString
            sb.setLength(0)
            if (lines.size >= maxLines) { done = true; truncated = true }
          } else sb.append(c)
          i += 1
        }
        if (!done) n = reader.read(buf)
      }
      if (!done && sb.length > 0) { // unterminated final line: one row (EOF bounds it)
        if (sb.charAt(sb.length - 1) == '\r') sb.setLength(sb.length - 1)
        lines += sb.toString
      }
    } finally socket.close()
    if (truncated)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"SocketSource.readBounded($host:$port): maxLines=$maxLines reached — " +
        "result is TRUNCATED, not a complete drain; an unbounded peer belongs on readStream")
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
