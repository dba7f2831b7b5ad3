package graft.operators

import java.net.{InetSocketAddress, Socket, URI}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

/** REAL HTTP provider path for the Embedding / LLM transforms.
  *
  * Mirrors the reference's remote model clients
  * (transform/nlpmodel/embedding/remote/{openai,qianfan,doubao}/...,
  * transform/nlpmodel/llm/remote/{openai,kimiai,microsoft}/...): request
  * shaping, auth headers, batching, and response parsing are the same
  * contracts, re-implemented over the JDK HttpClient (no Apache
  * HttpComponents on this classpath).
  *
  * Providers are Serializable config holders; the client is built lazily
  * INSIDE the executor (one per provider instance per JVM), so a
  * 1000-executor job opens 1000 clients, not one driver bottleneck —
  * the same shape as the reference's per-subtask clients.
  */
object NlpHttp {

  private val mapper = new ObjectMapper()

  // one shared client per executor JVM (providers reach it via static
  // module access, so nothing here rides in task closures)
  private[operators] lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(20)).build()

  def postJson(url: String, body: String, headers: Map[String, String]): String = {
    var b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(20))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
    headers.foreach { case (k, v) => b = b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} from $url: ${resp.body().take(500)}")
    resp.body()
  }

  def getJson(url: String): String = getJsonWithHeaders(url, Map.empty)

  def getJsonWithHeaders(url: String, headers: Map[String, String]): String = {
    var b = HttpRequest.newBuilder(URI.create(url)).timeout(Duration.ofSeconds(20)).GET()
    headers.foreach { case (k, v) => b = b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()} from $url")
    resp.body()
  }

  /** POST an application/x-www-form-urlencoded body. */
  def postForm(url: String, formBody: String, headers: Map[String, String]): String = {
    var b = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(20))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(HttpRequest.BodyPublishers.ofString(formBody, StandardCharsets.UTF_8))
    headers.foreach { case (k, v) => b = b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()} from $url: ${resp.body().take(300)}")
    resp.body()
  }

  /** Driver-side probe: is the endpoint's host:port connectable? Decides
    * once per plan whether the HTTP provider or the deterministic local
    * fallback runs — so reference configs addressing an absent mockserver
    * still run verbatim (sandbox-honest degradation), while a live
    * endpoint gets the real network path.
    */
  def reachable(url: String, timeoutMs: Int = 500): Boolean =
    try {
      val u = URI.create(url)
      val port = if (u.getPort > 0) u.getPort else if (u.getScheme == "https") 443 else 80
      val s = new Socket()
      try { s.connect(new InetSocketAddress(u.getHost, port), timeoutMs); true }
      finally s.close()
    } catch { case _: Exception => false }

  // ---------- embedding providers ----------

  /** Batch-embedding SPI (reference embedding/remote/Model.vector). */
  trait EmbeddingProvider extends Serializable {
    def embed(texts: Seq[String]): Seq[Array[Float]]
  }

  /** `{"data":[{"embedding":[...]}...]}` — the response shape every
    * reference embedding provider returns (openai/qianfan/doubao/custom).
    */
  private[operators] def parseEmbeddings(json: String, n: Int): Seq[Array[Float]] = {
    val data = mapper.readTree(json).get("data")
    require(data != null && data.isArray, s"no data array in embedding response")
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    data.forEach { node =>
      val emb = node.get("embedding")
      val arr = new Array[Float](emb.size())
      var i = 0
      while (i < arr.length) { arr(i) = emb.get(i).floatValue(); i += 1 }
      out += arr
    }
    // ONLY a single-element response (the e2e mock's fixed reply) fans out
    // over the batch; any other size mismatch is a misaligned provider and
    // must error rather than silently assign wrong vectors (ADVICE r6)
    if (out.isEmpty) Seq.fill(n)(Array.empty[Float])
    else if (out.size == 1) Seq.fill(n)(out.head)
    else {
      require(out.size == n,
        s"embedding response has ${out.size} vectors for a batch of $n")
      out.toSeq
    }
  }

  private def jsonArray(texts: Seq[String]): String =
    texts.map(t => mapper.writeValueAsString(Option(t).getOrElse("")))
      .mkString("[", ",", "]")

  /** OpenAI embeddings (embedding/remote/openai/OpenAIModel.java):
    * Bearer auth, `{"model": m, "input": [...]}`.
    */
  final case class OpenAiEmbedding(apiPath: String, apiKey: String, model: String)
      extends EmbeddingProvider {
    override def embed(texts: Seq[String]): Seq[Array[Float]] = {
      val body = s"""{"model":${mapper.writeValueAsString(model)},"input":${jsonArray(texts)}}"""
      parseEmbeddings(postJson(apiPath, body,
        Map("Authorization" -> s"Bearer $apiKey")), texts.size)
    }
  }

  /** Doubao embeddings (embedding/remote/doubao/DoubaoModel.java): same
    * body shape as OpenAI, Bearer auth.
    */
  final case class DoubaoEmbedding(apiPath: String, apiKey: String, model: String)
      extends EmbeddingProvider {
    override def embed(texts: Seq[String]): Seq[Array[Float]] = {
      val body = s"""{"model":${mapper.writeValueAsString(model)},"input":${jsonArray(texts)}}"""
      parseEmbeddings(postJson(apiPath, body,
        Map("Authorization" -> s"Bearer $apiKey")), texts.size)
    }
  }

  /** Qianfan embeddings (embedding/remote/qianfan/QianfanModel.java):
    * oauth access token first, then `POST apiPath/model?access_token=...`
    * with `{"input":[...]}`.
    */
  final case class QianfanEmbedding(apiPath: String, oauthPath: String,
      apiKey: String, secretKey: String, model: String) extends EmbeddingProvider {
    @transient private var token: String = _
    private def accessToken: String = {
      if (token == null) {
        val resp = getJson(s"$oauthPath?grant_type=client_credentials" +
          s"&client_id=$apiKey&client_secret=$secretKey")
        token = mapper.readTree(resp).get("access_token").asText()
      }
      token
    }
    override def embed(texts: Seq[String]): Seq[Array[Float]] = {
      val base = if (apiPath.endsWith("/")) apiPath else apiPath + "/"
      val url = s"$base$model?access_token=$accessToken"
      parseEmbeddings(postJson(url, s"""{"input":${jsonArray(texts)}}""", Map.empty),
        texts.size)
    }
  }

  // ---------- chat (LLM) providers ----------

  /** The reference's batching contract (llm/remote/AbstractModel.java:
    * getPromptWithLimit + inference): ONE request per row batch — system
    * message = user prompt + array-protocol rules, user message = JSON
    * array of the serialized rows; the model answers a JSON array of
    * per-row results inside choices[0].message.content.
    */
  def promptWithRules(prompt: String, outputType: String): String =
    prompt +
      "\n The following rules need to be followed: " +
      "\n 1. The received data is an array, and the result is returned in the form of an array." +
      "\n 2. Only the result needs to be returned, and no other information can be returned." +
      s"\n 3. The element type of the array is ${outputType.toUpperCase}." +
      "\n Eg: [\"value1\", \"value2\"]"

  /** Strip markdown fences the model may wrap around the JSON array
    * (reference AbstractModel.convertData).
    */
  private def convertData(s: String): String = {
    val t = s.trim
    if (t.startsWith("```")) t.stripPrefix("```json").stripPrefix("```")
      .stripSuffix("```").trim
    else t
  }

  private[operators] def parseChatContent(responseStr: String, n: Int): Seq[String] = {
    val content = mapper.readTree(responseStr)
      .get("choices").get(0).get("message").get("content").asText()
    val node = mapper.readTree(convertData(content))
    val results = if (node.isArray) {
      val b = scala.collection.mutable.ArrayBuffer.empty[String]
      node.forEach(x => b += (if (x.isNull) null else x.asText()))
      b.toSeq
    } else Seq(node.asText())
    // ONLY a single-element response (fixed mock reply) fans out over the
    // batch; other size mismatches error instead of assigning answers to
    // the wrong rows (ADVICE r6)
    if (results.isEmpty) Seq.fill(n)(null)
    else if (results.size == 1) Seq.fill(n)(results.head)
    else {
      require(results.size == n,
        s"chat response has ${results.size} answers for a batch of $n")
      results
    }
  }

  /** OpenAI-shape chat completion (llm/remote/openai/OpenAIModel.java,
    * also the KimiAI shape): Bearer auth,
    * `{"model", "messages": [system, user]}`.
    */
  final case class OpenAiChat(apiPath: String, apiKey: String, model: String,
      systemPrompt: String) extends LlmOp.LlmProvider {
    override def complete(prompts: Seq[String]): Seq[String] = {
      val body = mapper.createObjectNode()
      body.put("model", model)
      val messages = body.putArray("messages")
      messages.addObject().put("role", "system").put("content", systemPrompt)
      messages.addObject().put("role", "user").put("content", jsonArray(prompts))
      parseChatContent(postJson(apiPath, mapper.writeValueAsString(body),
        Map("Authorization" -> s"Bearer $apiKey")), prompts.size)
    }
  }

  /** Azure/Microsoft chat (llm/remote/microsoft/MicrosoftModel.java):
    * `api-key` header, deployment path carries a ${model} placeholder.
    */
  final case class MicrosoftChat(apiPath: String, apiKey: String, model: String,
      systemPrompt: String) extends LlmOp.LlmProvider {
    override def complete(prompts: Seq[String]): Seq[String] = {
      val url = apiPath.replace("${model}", model)
      val body = mapper.createObjectNode()
      val messages = body.putArray("messages")
      messages.addObject().put("role", "system").put("content", systemPrompt)
      messages.addObject().put("role", "user").put("content", jsonArray(prompts))
      parseChatContent(postJson(url, mapper.writeValueAsString(body),
        Map("api-key" -> apiKey)), prompts.size)
    }
  }
}
