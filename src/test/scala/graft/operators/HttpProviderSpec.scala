package graft.operators

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.api.Pipeline

/** The REAL HTTP provider path for Embedding/LLM, exercised against an
  * in-process mock replicating the reference e2e's mockserver
  * expectations (transforms-v2-e2e-part-1 mockserver-config.json +
  * mock-embedding.json: qianfan oauth + embedding, doubao/openai
  * embedding, openai chat completions). The reference configs run
  * VERBATIM with their `mockserver:1080` authority mapped to the local
  * listener — the container-DNS analog (Pipeline.rebaseEndpoints).
  */
class HttpProviderSpec extends SparkSpec with BeforeAndAfterAll {

  private val e2e1 = "/root/reference/seatunnel-e2e/seatunnel-transforms-v2-e2e/" +
    "seatunnel-transforms-v2-e2e-part-1/src/test/resources/"

  private def load(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  // requests the mock saw: (path, authHeader, body)
  private val seen = new ConcurrentLinkedQueue[(String, String, String)]()

  private var server: HttpServer = _
  private var port: Int = 0

  private def reply(ex: HttpExchange, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(200, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def record(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
    seen.add((ex.getRequestURI.toString, auth, body))
  }

  private def vecJson(v: Seq[Double]): String =
    s"""{"object":"list","data":[{"object":"embedding","index":0,"embedding":[${v.mkString(",")}]}],"usage":{}}"""

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // mock-embedding.json expectations
    server.createContext("/v1/qianfan/token", ex => {
      record(ex)
      reply(ex, """{"access_token":"test-token-123","expires_in":2592000}""")
    })
    server.createContext("/v1/qianfan/embedding", ex => {
      record(ex)
      reply(ex, vecJson(Seq(0.25, -0.5, 0.75, 1.0)))
    })
    server.createContext("/v1/doubao/embedding", ex => {
      record(ex)
      reply(ex, vecJson(Seq(1.0, 2.0, 3.0, 4.0)))
    })
    server.createContext("/v1/openai/embedding", ex => {
      record(ex)
      // the reference mock's openai fixture is 4-dimensional
      reply(ex, vecJson(Seq(-0.02, 0.01, 0.03, -0.04)))
    })
    // mockserver-config.json: openai chat completions
    server.createContext("/v1/chat/completions", ex => {
      record(ex)
      reply(ex,
        """{"id":"chatcmpl-1","object":"chat.completion","model":"gpt-4o-mini",""" +
          """"choices":[{"index":0,"message":{"role":"assistant","content":"[\"Chinese\"]"},"finish_reason":"stop"}],"usage":{}}""")
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    try if (server != null) server.stop(0)
    finally super.afterAll()
  }

  private def runRebased(conf: String): Map[String, org.apache.spark.sql.DataFrame] =
    Pipeline.run(spark, Pipeline.rebaseEndpoints(
      Pipeline.parseHocon(conf), Map("mockserver:1080" -> s"127.0.0.1:$port")))

  test("reference embedding_transform.conf runs verbatim against the live HTTP mock " +
      "(qianfan oauth+embedding, doubao, openai)") {
    seen.clear()
    val catalog = runRebased(load(e2e1 + "embedding_transform.conf"))
    // every provider output table carries the MOCK's vectors — proof the
    // network path ran, not the local fallback
    val openai = catalog("embedding_output_3")
    val v = openai.select("book_intro_vector").collect()(0).getSeq[Float](0)
    assert(v.map(_.toDouble) == Seq(-0.02f, 0.01f, 0.03f, -0.04f).map(_.toDouble),
      s"openai vector came back $v")
    val qianfan = catalog("embedding_output_1")
    assert(qianfan.select("book_intro_vector").collect()(0).getSeq[Float](0).length == 4)
    val doubao = catalog("embedding_output_2")
    assert(doubao.select("author_biography_vector").collect()(0).getSeq[Float](0) ==
      Seq(1.0f, 2.0f, 3.0f, 4.0f))

    val paths = seen.toArray.map(_.asInstanceOf[(String, String, String)])
    // qianfan fetched a token, then embedded with it
    assert(paths.exists(_._1.startsWith("/v1/qianfan/token")))
    assert(paths.exists(p => p._1.startsWith("/v1/qianfan/embedding/bge_large_en") &&
      p._1.contains("access_token=test-token-123")))
    // openai/doubao sent Bearer auth and the configured model in the body
    val op = paths.filter(_._1.startsWith("/v1/openai/embedding"))
    assert(op.nonEmpty && op.forall(_._2 == "Bearer xxxxxxxx"))
    assert(op.exists(_._3.contains("\"model\":\"text-embedding-3-small\"")))
    assert(op.exists(_._3.contains("\"input\":[")))
  }

  test("reference llm_openai_transform.conf runs verbatim against the live HTTP mock " +
      "(batched chat request, array response)") {
    seen.clear()
    val catalog = runRebased(load(e2e1 + "llm_openai_transform.conf"))
    val out = catalog("llm_output")
    val answers = out.select("llm_output").collect().map(_.getString(0))
    assert(answers.nonEmpty && answers.forall(_ == "Chinese"),
      s"expected the mock's answer for every row, got ${answers.toSeq}")
    val chat = seen.toArray.map(_.asInstanceOf[(String, String, String)])
      .filter(_._1.startsWith("/v1/chat/completions"))
    assert(chat.nonEmpty)
    // reference protocol: system message with the array rules + user
    // message carrying the serialized row batch
    assert(chat.exists(_._3.contains("\"role\":\"system\"")))
    assert(chat.exists(_._3.contains("result is returned in the form of an array")))
    assert(chat.exists(_._3.contains("\"model\":\"gpt-4o-mini\"")))
    assert(chat.forall(_._2.startsWith("Bearer ")))
  }

  test("unreachable api_path degrades to the deterministic local provider (sandbox-honest)") {
    // verbatim run with the mockserver authority left unresolved: the
    // plan builds, the stub answers, schema contract unchanged
    val catalog = Pipeline.runHocon(spark, load(e2e1 + "llm_openai_transform.conf"))
    assert(catalog("llm_output").select("llm_output").collect().forall(!_.isNullAt(0)))
  }

  test("partial/misaligned provider responses error instead of mis-assigning rows (ADVICE r6)") {
    // 1-element replies (the mock shape) fan out over any batch...
    val one = """{"data":[{"embedding":[1.0,2.0]}]}"""
    assert(NlpHttp.parseEmbeddings(one, 3).forall(_.sameElements(Array(1.0f, 2.0f))))
    val oneChat = """{"choices":[{"message":{"content":"[\"x\"]"}}]}"""
    assert(NlpHttp.parseChatContent(oneChat, 3) == Seq("x", "x", "x"))
    // ...full-size replies pass through aligned...
    val full = """{"data":[{"embedding":[1.0]},{"embedding":[2.0]}]}"""
    assert(NlpHttp.parseEmbeddings(full, 2).map(_.head) == Seq(1.0f, 2.0f))
    // ...but a 2-of-3 reply is a misaligned provider and must throw
    intercept[IllegalArgumentException](NlpHttp.parseEmbeddings(full, 3))
    val twoChat = """{"choices":[{"message":{"content":"[\"a\",\"b\"]"}}]}"""
    intercept[IllegalArgumentException](NlpHttp.parseChatContent(twoChat, 3))
  }
}
