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
  * budget) holds per request. Requests are dispatched on a fixed
  * thread pool (`server.setExecutor`; without one the JDK server
  * handles requests serially on its dispatcher thread, so one slow
  * /timeseries would block /metadata) and `start` flips the session
  * to `spark.scheduler.mode=FAIR` so concurrent extractions share
  * executor slots round-robin instead of queueing FIFO behind the
  * first request's stages.
  */
object HttpApi {

  /** HTTP worker threads — bounds concurrent in-flight extractions.
    * Handlers on the serving path mostly BLOCK on the coalescer's
    * shared micro-batch (cheap driver-side math around one await), so
    * the pool is sized to admit a full client burst into ONE batch
    * rather than to ration executor slots; the batch path's heavier
    * per-request jobs still share slots via FAIR scheduling. */
  private val HttpThreads = 48

  /** Serving fast path (driver-side series math over one bounded
    * cluster job) is default-ON; only an explicit opt-out value
    * disables it — any enable-ish spelling ("1"/"true"/"yes"/unset)
    * keeps it on, so SPARK_GRAFT_SERVE_CACHE=true no longer silently
    * selects the slow scan path. Computed once at class init. */
  private[api] val ServeFastPath: Boolean =
    sys.env.get("SPARK_GRAFT_SERVE_CACHE")
      .forall(v => !Set("0", "false", "no", "off").contains(v.trim.toLowerCase))

  final case class Server(http: HttpServer,
      pool: java.util.concurrent.ExecutorService) {
    def port: Int = http.getAddress.getPort
    def stop(): Unit = { http.stop(0); pool.shutdownNow(); () }
  }

  /** Start serving on 127.0.0.1:`port` (0 = ephemeral).
    *
    * Scheduler note: `spark.scheduler.mode` is read once at
    * SparkContext start and cannot be flipped afterwards, so the
    * serving application must build its session with
    * `.config("spark.scheduler.mode", "FAIR")` (as SparkSpec does);
    * this method fails fast if the context is FIFO rather than
    * silently serializing extractions behind each other's stages.
    * Each handler thread then tags its jobs into the `graft_http`
    * FAIR pool via a thread-local property. */
  def start(spark: SparkSession, dir: String, port: Int = 0): Server = {
    require(
      spark.sparkContext.getConf.get("spark.scheduler.mode", "FIFO")
        .equalsIgnoreCase("FAIR"),
      "HttpApi needs spark.scheduler.mode=FAIR on the session " +
        "(set at SparkSession build; it is immutable on a live context)")
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = handleOne(spark, dir, ex)
    })
    val pool = java.util.concurrent.Executors.newFixedThreadPool(HttpThreads)
    server.setExecutor(pool)
    server.start()
    Server(server, pool)
  }

  private def handleOne(spark: SparkSession, dir: String,
      ex: HttpExchange): Unit = {
    // per-thread FAIR pool tag: jobs from concurrent requests share
    // executor slots round-robin instead of queueing FIFO
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", "graft_http")
    val body =
      try new String(ex.getRequestBody.readAllBytes(), UTF_8)
      finally ex.getRequestBody.close()
    val (status, json) =
      try {
        (ex.getRequestMethod, ex.getRequestURI.getPath) match {
          case ("GET", "/metadata") => (200, MetadataJson.toJson)
          case ("GET", "/settings") => (200, settingsJson())
          // extraction AND serialization run under the request's own
          // max_processing_time budget — the reference wraps the whole
          // service call in asyncio.wait_for (main.py:48-56), and the
          // collect lives inside toJson, so a bare extractTimeseries
          // here would leave the 504 arm unreachable
          case ("POST", "/timeseries") =>
            val req = RequestJson.parse(body)
            (200, materializeWithTimeout(spark, req.maxProcessingTimeMs) {
              ResponseJson.toJson(req,
                extractTimeseries(spark, dir, req, serving = ServeFastPath))
            })
          case ("POST", "/v1/timeseries") =>
            val (req, geom) = RequestJson.parseV1(body)
            (200, materializeWithTimeout(spark, req.maxProcessingTimeMs) {
              ResponseJson.toV1Json(req, geom,
                extractTimeseries(spark, dir, req, serving = ServeFastPath))
            })
          case _ => (404, """{"detail":"Not Found"}""")
        }
      } catch {
        case t: TimeseriesTimeoutError =>
          (504, s"""{"detail":${quote(t.getMessage)},""" +
            s""""processing_time":${t.ms / 1000.0}}""")
        case t: RuntimeException if isValidation(t) =>
          (422, s"""{"detail":[{"msg":${quote(t.getMessage)}}]}""")
        case scala.util.control.NonFatal(t) =>
          // FastAPI's CORSMiddleware wraps even unhandled errors, so a
          // 500 from the reference still carries the CORS header; left
          // to the JDK default it would not (and would kill this
          // worker's response path). Mirror the {"detail": ...} shape.
          (500, s"""{"detail":${quote(
            s"${t.getClass.getSimpleName}: ${t.getMessage}")}}""")
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
    * graft equivalents. Anything else becomes a 500 JSON envelope
    * (handled in handleOne) so the CORS header survives failures the
    * way it does under FastAPI's middleware stack. */
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
