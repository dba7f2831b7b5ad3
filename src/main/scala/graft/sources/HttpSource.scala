package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** REAL HTTP source (reference: connector-http HttpSource/HttpSourceReader
  * + its SaaS wrappers Github/Gitlab/Jira/Klaviyo/Lemlist/Notion/
  * OneSignal/PersistIQ — same engine, provider-specific auth headers).
  *
  * The reference reader is a single unpartitioned poll loop per source,
  * so the faithful scale shape IS a driver-side fetch (config-bounded,
  * like literal rows) that parallelizes the parsed rows; row PARSING and
  * typing run distributed through Spark's JSON reader. Response routing
  * per the reference's DeserializationCollectorCollector:
  *   - `json_field`: column-wise JSONPaths zipped into rows
  *   - `content_field`: a JSONPath selecting the row array
  *   - `enable_multi_lines`: newline-delimited JSON objects
  *   - otherwise: a JSON array (row per element) or single object
  *   - no schema: the raw body lands in one `content` column
  * Pagination (HttpPaging): `page_field` + either a fixed
  * `total_page_size` (+ optional `start_page_number`) or open-ended
  * `batch_size` probing (stop when a page returns fewer rows).
  */
object HttpSource {

  private val mapper = new ObjectMapper()

  final case class Config(
      url: String,
      method: String = "GET",
      headers: Map[String, String] = Map.empty,
      params: Map[String, String] = Map.empty,
      body: Option[String] = None,
      schema: Option[StructType] = None,
      contentField: Option[String] = None,
      jsonFields: Map[String, String] = Map.empty,
      multiLine: Boolean = false,
      dateFormat: Option[String] = None,
      datetimeFormat: Option[String] = None,
      pageField: Option[String] = None,
      totalPageSize: Option[Int] = None,
      startPageNumber: Int = 1,
      batchSize: Int = 10)

  // ---------- tiny JSONPath subset over Jackson trees ----------
  // covers the reference e2e's paths: $.a.b, $.a.*, $.a[*], $.a[*].b

  private[sources] def evalPath(root: JsonNode, path: String): Seq[JsonNode] = {
    val norm = path.trim.stripPrefix("$").replace("[*]", ".*")
    val steps = norm.split('.').filter(_.nonEmpty)
    steps.foldLeft(Seq(root)) { (nodes, step) =>
      nodes.flatMap { n =>
        step match {
          case "*" =>
            if (n.isArray) n.elements().asScala.toSeq
            else if (n.isObject) n.properties().asScala.map(_.getValue).toSeq
            else Nil
          case f =>
            Option(n.get(f)).toSeq
        }
      }
    }
  }

  private def fetchOnce(cfg: Config, extraParams: Map[String, String]): String = {
    val allParams = cfg.params ++ extraParams
    val qs = allParams.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    cfg.method.toUpperCase match {
      case "GET" =>
        val u = if (qs.isEmpty) cfg.url
          else cfg.url + (if (cfg.url.contains("?")) "&" else "?") + qs
        graft.operators.NlpHttp.getJsonWithHeaders(u, cfg.headers)
      case "POST" =>
        cfg.body match {
          case Some(b) => graft.operators.NlpHttp.postJson(cfg.url, b, cfg.headers)
          case None =>
            // params become a form body (the reference's formrequestbody)
            graft.operators.NlpHttp.postForm(cfg.url, qs, cfg.headers)
        }
      case other => throw new IllegalArgumentException(s"Http source: method $other")
    }
  }

  /** Row-JSON strings out of one response body. */
  private[sources] def rowsOf(cfg: Config, body: String): Seq[String] = {
    if (cfg.jsonFields.nonEmpty) {
      val root = mapper.readTree(body)
      val cols = cfg.jsonFields.toSeq.map { case (name, p) => name -> evalPath(root, p) }
      val n = cols.map(_._2.size).maxOption.getOrElse(0)
      (0 until n).map { i =>
        val o = mapper.createObjectNode()
        cols.foreach { case (name, vals) =>
          if (i < vals.size) o.set(name, vals(i)) else o.putNull(name)
        }
        mapper.writeValueAsString(o)
      }
    } else if (cfg.contentField.isDefined) {
      val selected = evalPath(mapper.readTree(body), cfg.contentField.get)
      // a path landing on ONE array selects its elements as rows
      val nodes = selected match {
        case Seq(one) if one.isArray => one.elements().asScala.toSeq
        case many => many
      }
      nodes.map(mapper.writeValueAsString)
    } else if (cfg.multiLine) {
      body.split("\r?\n").map(_.trim).filter(_.nonEmpty).toSeq
    } else {
      val root = mapper.readTree(body)
      if (root.isArray) root.elements().asScala.map(mapper.writeValueAsString).toSeq
      else Seq(mapper.writeValueAsString(root))
    }
  }

  private def fetchAll(cfg: Config): Seq[String] = cfg.pageField match {
    case None => Seq(fetchOnce(cfg, Map.empty))
    case Some(pf) => cfg.totalPageSize match {
      case Some(total) =>
        // reference HttpPaging: pages run startPageNumber..totalPageSize
        // INCLUSIVE (total_page_size is the last page number, not a count)
        (cfg.startPageNumber to total)
          .map(p => fetchOnce(cfg, Map(pf -> p.toString)))
      case None =>
        // open-ended: stop at the first page with fewer than batch_size rows
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var page = cfg.startPageNumber
        var done = false
        while (!done && page < cfg.startPageNumber + 10000) {
          val b = fetchOnce(cfg, Map(pf -> page.toString))
          out += b
          if (rowsOf(cfg, b).size < cfg.batchSize) done = true
          page += 1
        }
        out.toSeq
    }
  }

  def read(spark: SparkSession, cfg: Config): DataFrame = {
    import spark.implicits._
    val rowJsons = fetchAll(cfg).flatMap(rowsOf(cfg, _))
    cfg.schema match {
      case Some(st) =>
        var r = spark.read.schema(st)
        cfg.dateFormat.foreach(f => r = r.option("dateFormat", f))
        cfg.datetimeFormat.foreach(f => r = r.option("timestampFormat", f))
        r.json(spark.createDataset(rowJsons))
      case None =>
        // reference no-schema contract: raw content, one row per payload
        rowJsons.toDF("content")
    }
  }

  /** Build a Config from reference-style plugin options (shared by Http
    * and its SaaS alias plugins — access_token/password map onto the
    * Authorization header the wrappers set).
    */
  def configFrom(url: String, opts: Map[String, Any],
      schema: Option[StructType]): Config = {
    def str(k: String): Option[String] = opts.get(k).map(_.toString)
    def smap(k: String): Map[String, String] = opts.get(k) match {
      case Some(m: Map[_, _]) => m.map { case (a, b) => a.toString -> b.toString }
      case _ => Map.empty
    }
    val paging = opts.get("pageing").orElse(opts.get("paging")) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    val auth: Map[String, String] =
      str("access_token").map(t => Map("Authorization" -> s"Bearer $t"))
        .orElse(str("password").map(p => Map("Authorization" -> s"Bearer $p")))
        .getOrElse(Map.empty)
    Config(
      url = url,
      method = str("method").getOrElse("GET").toUpperCase,
      headers = auth ++ smap("headers"),
      params = smap("params"),
      body = str("body"),
      schema = schema,
      contentField = str("content_field"),
      jsonFields = smap("json_field"),
      multiLine = str("enable_multi_lines").exists(_.toBoolean),
      dateFormat = str("date_format"),
      datetimeFormat = str("datetime_format"),
      pageField = paging.get("page_field").map(_.toString),
      totalPageSize = paging.get("total_page_size").map(_.toString.toInt),
      startPageNumber = paging.get("start_page_number").map(_.toString.toInt).getOrElse(1),
      batchSize = paging.get("batch_size").map(_.toString.toInt).getOrElse(10))
  }
}
