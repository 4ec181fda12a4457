package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.api.Api._

/** Thin HTTP transport over the typed API — the reference's FastAPI
  * surface (timeseries/app/main.py, routers/v1/api.py:11,
  * routers/v2/api.py:15-29) re-served from the JDK's built-in
  * HttpServer, so the parity claim is externally demonstrable over the
  * wire with ZERO dependencies beyond the JDK: a skope-api client
  * pointed at this port sends its request bodies unchanged and reads
  * the same response shapes.
  *
  * Routes (paths as the reference mounts them):
  *   GET  /metadata       → the metadata.yml document list
  *   GET  /settings       → effective limits + grid geo-transform
  *   POST /timeseries     → v2 extraction (RequestJson.parse →
  *                          extractTimeseries → ResponseJson.toJson)
  *   POST /v1/timeseries  → v1 extraction (parseV1 → toV1Json)
  *
  * Error mapping mirrors main.py's exception handlers: a timeout →
  * 504 {detail, processing_time} (main.py:48-56); every validation /
  * parse error → 422 {detail: [{msg}]} (main.py:58-64, the
  * RequestValidationError envelope); unknown route → 404. Responses
  * carry `Access-Control-Allow-Origin: *` like the reference's
  * allow-all CORS middleware for its public API (main.py:32-39).
  *
  * Scale note: the transport is deliberately thin — one Spark job per
  * request through the same `extractTimeseries` plan the batch
  * operators use, so everything the engine guarantees (pushed band
  * clips, broadcast joins, the max-cells guard, the processing-time
  * budget) holds per request; concurrency comes from Spark's FAIR
  * scheduler pools, not from the HTTP layer.
  */
object HttpApi {

  final case class Server(http: HttpServer) {
    def port: Int = http.getAddress.getPort
    def stop(): Unit = http.stop(0)
  }

  /** Start serving on 127.0.0.1:`port` (0 = ephemeral). */
  def start(spark: SparkSession, dir: String, port: Int = 0): Server = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = handleOne(spark, dir, ex)
    })
    server.start()
    Server(server)
  }

  private def handleOne(spark: SparkSession, dir: String,
      ex: HttpExchange): Unit = {
    val body =
      try new String(ex.getRequestBody.readAllBytes(), UTF_8)
      finally ex.getRequestBody.close()
    val (status, json) =
      try {
        (ex.getRequestMethod, ex.getRequestURI.getPath) match {
          case ("GET", "/metadata") => (200, MetadataJson.toJson)
          case ("GET", "/settings") => (200, settingsJson())
          case ("POST", "/timeseries") =>
            val req = RequestJson.parse(body)
            (200, ResponseJson.toJson(req, extractTimeseries(spark, dir, req)))
          case ("POST", "/v1/timeseries") =>
            val (req, geom) = RequestJson.parseV1(body)
            (200, ResponseJson.toV1Json(req, geom,
              extractTimeseries(spark, dir, req)))
          case _ => (404, """{"detail":"Not Found"}""")
        }
      } catch {
        case t: TimeseriesTimeoutError =>
          (504, s"""{"detail":${quote(t.getMessage)},""" +
            s""""processing_time":${t.ms / 1000.0}}""")
        case t: RuntimeException if isValidation(t) =>
          (422, s"""{"detail":[{"msg":${quote(t.getMessage)}}]}""")
      }
    val bytes = json.getBytes(UTF_8)
    val h = ex.getResponseHeaders
    h.set("Content-Type", "application/json")
    h.set("Access-Control-Allow-Origin", "*")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  /** The reference funnels every request problem through
    * TimeseriesValidationError → 422 (main.py:58-64); these are the
    * graft equivalents. An unexpected exception is deliberately NOT
    * caught: the JDK server answers 500, which is also what an
    * unhandled exception does under FastAPI. */
  private def isValidation(t: RuntimeException): Boolean = t match {
    case _: RequestJson.RequestParseError | _: DatasetNotFoundError |
        _: SelectedAreaOutOfBoundsError |
        _: SelectedAreaPolygonIsNotValidError | _: VariableNotFoundError |
        _: TimeRangeContainmentError | _: TimeRangeInvalidError |
        _: SelectedAreaTooLargeError => true
    case _ => false
  }

  private def quote(s: String): String =
    "\"" + Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
