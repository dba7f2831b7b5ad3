package graft.sources

import graft.SparkSpec
import graft.sinks.SocketSink
import org.apache.spark.sql.functions._

/** Socket connector (reference connector-socket): bounded/streaming
  * source, JSON-line sink with connect retries, Pipeline wiring.
  */
class SocketConnectorSpec extends SparkSpec {
  import spark.implicits._

  /** One-connection-per-accept line server; returns (port, stop). */
  private def lineServer(linesPerConn: Seq[String]): (Int, () => Unit) = {
    val server = new java.net.ServerSocket(0, 50,
      java.net.InetAddress.getByName("127.0.0.1"))
    val t = new Thread(() =>
      try while (true) {
        val s = server.accept()
        val out = new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8")
        linesPerConn.foreach(l => out.write(l))
        out.flush(); s.close()
      } catch { case _: java.io.IOException => () })
    t.setDaemon(true); t.start()
    (server.getLocalPort, () => server.close())
  }

  /** Accept-loop collector; returns (port, received-lines buffer, stop). */
  private def collectorServer(): (Int, java.util.concurrent.ConcurrentLinkedQueue[String], () => Unit) = {
    val server = new java.net.ServerSocket(0, 50,
      java.net.InetAddress.getByName("127.0.0.1"))
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t = new Thread(() =>
      try while (true) {
        val s = server.accept()
        new Thread(() => {
          val r = new java.io.BufferedReader(
            new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
          var line = r.readLine()
          while (line != null) { got.add(line); line = r.readLine() }
          s.close()
        }).start()
      } catch { case _: java.io.IOException => () })
    t.setDaemon(true); t.start()
    (server.getLocalPort, got, () => server.close())
  }

  test("readBounded: newline-split rows, \\r stripped, EOF bounds the read") {
    val (port, stop) = lineServer(Seq("alpha\r\n", "beta\n", "gamma\n"))
    try {
      val got = SocketSource.readBounded(spark, "127.0.0.1", port)
        .as[String].collect().toSeq
      assert(got == Seq("alpha", "beta", "gamma"))
    } finally stop()
  }

  test("readBounded: lone \\r is NOT a terminator; unterminated final line is one row") {
    // reference SocketSourceReader splits on '\n' only (strip trailing
    // '\r'): "a\rb\n" is ONE row — BufferedReader.readLine would split it
    // in two (ADVICE r11)
    val (port, stop) = lineServer(Seq("a\rb\n", "tail-no-newline"))
    try {
      val got = SocketSource.readBounded(spark, "127.0.0.1", port)
        .as[String].collect().toSeq
      assert(got == Seq("a\rb", "tail-no-newline"))
    } finally stop()
  }

  test("readBounded: maxLines caps the read (truncation is logged, result bounded)") {
    val (port, stop) = lineServer(Seq("l1\n", "l2\n", "l3\n", "l4\n"))
    try {
      val got = SocketSource.readBounded(spark, "127.0.0.1", port, maxLines = 2)
        .as[String].collect().toSeq
      assert(got == Seq("l1", "l2"))
    } finally stop()
  }

  test("sink flushes per line: a row is on the wire before the next one is produced") {
    // reference SocketClient writes+flushes per row, which is what makes
    // its single-row reconnect replay lossless (ADVICE r11). Proven here
    // by gating the input iterator on the COLLECTOR having received the
    // previous line — with cross-row buffering this would deadlock until
    // the 5 s deadline and fail.
    val (port, got, stop) = collectorServer()
    try {
      val lines = Seq("""{"n":1}""", """{"n":2}""", """{"n":3}""")
      val gated: Iterator[String] = new Iterator[String] {
        private var i = 0
        def hasNext: Boolean = i < lines.length
        def next(): String = {
          val deadline = System.nanoTime() + 5e9.toLong
          while (got.size < i && System.nanoTime() < deadline) Thread.sleep(10)
          assert(got.size >= i, s"line $i not flushed before line ${i + 1} was requested")
          i += 1; lines(i - 1)
        }
      }
      SocketSink.writePartition(gated, SocketSink.Config("127.0.0.1", port))
      val deadline = System.nanoTime() + 5e9.toLong
      while (got.size < 3 && System.nanoTime() < deadline) Thread.sleep(10)
      assert(got.toArray(Array.empty[String]).toSeq == lines)
    } finally stop()
  }

  test("sink write: every row lands as one JSON line; one connection per partition") {
    val (port, got, stop) = collectorServer()
    try {
      val df = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v").repartition(2)
      SocketSink.write(df, SocketSink.Config("127.0.0.1", port))
      val deadline = System.nanoTime() + 5e9.toLong
      while (got.size < 3 && System.nanoTime() < deadline) Thread.sleep(20)
      val lines = got.toArray(Array.empty[String]).toSet
      assert(lines == Set("""{"k":1,"v":"x"}""", """{"k":2,"v":"y"}""", """{"k":3,"v":"z"}"""))
    } finally stop()
  }

  test("sink connect retries until the server appears (reference max_retries contract)") {
    val port = { // reserve a free port, then release it
      val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p
    }
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // server starts late, after the first connect attempts have failed
    val starter = new Thread(() => {
      Thread.sleep(400)
      val server = new java.net.ServerSocket(port, 50,
        java.net.InetAddress.getByName("127.0.0.1"))
      val s = server.accept()
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
      var line = r.readLine()
      while (line != null) { got.add(line); line = r.readLine() }
      s.close(); server.close()
    })
    starter.setDaemon(true); starter.start()
    val df = Seq(Tuple1(42)).toDF("n").coalesce(1)
    SocketSink.write(df, SocketSink.Config("127.0.0.1", port,
      maxRetries = 20, retryDelayMs = 100))
    starter.join(5000)
    assert(got.toArray(Array.empty[String]).toSeq == Seq("""{"n":42}"""))
  }

  test("sink fails after exhausting retries when nothing listens") {
    val deadPort = { val s = new java.net.ServerSocket(0); val p = s.getLocalPort; s.close(); p }
    val df = Seq(Tuple1(1)).toDF("n").coalesce(1)
    val e = intercept[org.apache.spark.SparkException] {
      SocketSink.write(df, SocketSink.Config("127.0.0.1", deadPort,
        maxRetries = 1, retryDelayMs = 10))
    }
    assert(e.getMessage != null)
  }

  test("readStream: Spark socket source drains live lines into a memory sink") {
    val (port, stop) = lineServer(Seq("s1\n", "s2\n", "s3\n"))
    try {
      val q = SocketSource.readStream(spark, "127.0.0.1", port)
        .writeStream.format("memory").queryName("socket_stream_spec")
        .outputMode("append").start()
      try {
        val deadline = System.nanoTime() + 20e9.toLong
        def count() = spark.table("socket_stream_spec").count()
        while (count() < 3 && System.nanoTime() < deadline) {
          q.processAllAvailable()
          Thread.sleep(50)
        }
        val got = spark.table("socket_stream_spec").as[String].collect().toSet
        assert(got == Set("s1", "s2", "s3"))
      } finally q.stop()
    } finally stop()
  }

  test("Pipeline HOCON: Socket source -> Sql transform -> Socket sink end to end") {
    val (srcPort, stopSrc) = lineServer(Seq("7\n", "3\n", "11\n"))
    val (sinkPort, got, stopSink) = collectorServer()
    try {
      val conf = s"""
        |env { job.mode = "BATCH" }
        |source {
        |  Socket { host = "127.0.0.1", port = $srcPort, plugin_output = "raw" }
        |}
        |transform {
        |  Sql {
        |    plugin_input = "raw"
        |    plugin_output = "parsed"
        |    query = "select cast(value as int) as n from raw where cast(value as int) > 5"
        |  }
        |}
        |sink { Socket { host = "127.0.0.1", port = $sinkPort, plugin_input = "parsed" } }
        |""".stripMargin
      graft.api.Pipeline.runHocon(spark, conf)
      val deadline = System.nanoTime() + 5e9.toLong
      while (got.size < 2 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(got.toArray(Array.empty[String]).toSet == Set("""{"n":7}""", """{"n":11}"""))
    } finally { stopSrc(); stopSink() }
  }
}
