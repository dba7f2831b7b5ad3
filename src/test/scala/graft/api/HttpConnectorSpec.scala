package graft.api

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.core.JsonParser
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec

/** The reference connector-http e2e corpus, run VERBATIM against an
  * in-process server that replays the reference's OWN
  * mockserver-config.json expectations (method + path + query-param
  * matching, bodies served as recorded). `mockserver:1080` maps to the
  * local listener via Pipeline.rebaseEndpoints — the container-DNS
  * analog. Covers the plain Http source (schema'd JSON, content_field,
  * json_field, multi-line, POST json/form bodies, pagination in all
  * three reference forms), the SaaS wrapper plugins, and the Http sink.
  *
  * Excluded: http_streaming_json_to_postgresql.conf (PostgreSQL sink),
  * http_jsonrequestbody_to_feishu.conf (Feishu sink plugin) — both need
  * services beyond HTTP.
  */
class HttpConnectorSpec extends SparkSpec with BeforeAndAfterAll {

  private val res = "/root/reference/seatunnel-e2e/seatunnel-connector-v2-e2e/" +
    "connector-http-e2e/src/test/resources/"

  private def load(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  private case class Expectation(method: String, path: String,
      params: Map[String, String], body: String)

  private var server: HttpServer = _
  private var port: Int = 0
  private var expectations: Seq[Expectation] = Nil

  override def beforeAll(): Unit = {
    super.beforeAll()
    val mapper = new ObjectMapper()
    mapper.configure(JsonParser.Feature.ALLOW_COMMENTS, true)
    val root = mapper.readTree(load(res + "mockserver-config.json"))
    expectations = root.elements().asScala.toSeq.map { e =>
      val req = e.get("httpRequest")
      val resp = e.get("httpResponse")
      val params: Map[String, String] = Option(req.get("queryStringParameters"))
        .map(_.properties().asScala.map { en =>
          val v = en.getValue
          en.getKey -> (if (v.isArray) v.get(0).asText() else v.asText())
        }.toMap).getOrElse(Map.empty)
      val body = Option(resp.get("body")).map { b =>
        if (b.isTextual) b.asText() else mapper.writeValueAsString(b)
      }.getOrElse("")
      Expectation(Option(req.get("method")).map(_.asText()).getOrElse("GET"),
        req.get("path").asText(), params, body)
    }
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      val qp: Map[String, String] = query.split('&').filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
      ex.getRequestBody.readAllBytes() // drain
      val hit = expectations
        .filter(e => e.method.equalsIgnoreCase(ex.getRequestMethod) &&
          (e.path == path || path.matches(e.path)))
        .sortBy(e => -e.params.count { case (k, v) => qp.get(k).contains(v) })
        .find(e => e.params.forall { case (k, v) => qp.get(k).contains(v) })
      val (code, body) = hit match {
        case Some(e) => (200, e.body)
        case None => (404, s"""{"error":"no expectation for $path?$query"}""")
      }
      val bytes = body.getBytes("UTF-8")
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = {
    try if (server != null) server.stop(0)
    finally super.afterAll()
  }

  private def runConf(rel: String): Map[String, org.apache.spark.sql.DataFrame] =
    Pipeline.run(spark, Pipeline.rebaseEndpoints(
      Pipeline.parseHocon(load(res + rel)), Map("mockserver:1080" -> s"127.0.0.1:$port")))

  private val httpConfigs = Seq(
    "http_json_to_assert.conf",
    "http_multilinejson_to_assert.conf",
    "http_contentjson_to_assert.conf",
    "http_jsonpath_to_assert.conf",
    "http_jsonrequestbody_to_assert.conf",
    "http_formrequestbody_to_assert.conf",
    "http_page_increase_page_num.conf",
    "http_page_increase_start_num.conf",
    "http_page_increase_no_page_num.conf",
    "httpnoschema_to_http.conf",
    "fake_to_multitable.conf",
    "github_json_to_assert.conf",
    "gitlab_json_to_assert.conf",
    "jira_json_to_assert.conf",
    "klaviyo_json_to_assert.conf",
    "lemlist_json_to_assert.conf",
    "notion_json_to_assert.conf",
    "onesignal_json_to_assert.conf",
    "persistiq_json_to_assert.conf")

  httpConfigs.foreach { c =>
    test(s"reference e2e connector-http $c runs verbatim against the replayed mock") {
      runConf(c)
    }
  }
}
