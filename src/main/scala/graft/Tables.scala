package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Central loader for the driver-generated parquet tables (TESTDATA.md).
  *
  * At 100 TB these reads become partitioned datalake scans; everything
  * downstream only depends on the DataFrame, so swapping the source for a
  * partitioned/bucketed catalog table is a one-line change per table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 only reads as
    * a long (spark.sql.legacy.parquet.nanosAsLong — set in every session
    * builder here). Normalize it back to a proper µs timestamp so all
    * downstream plans see a TimestampType column; `div` keeps the
    * ns→µs conversion exact (no double rounding).
    */
  def events(s: SparkSession, d: String): DataFrame = eventsRange(s, d, None)

  /** events with an optional epoch-nanosecond [start, end) bound applied
    * to the RAW long column before the µs conversion — the predicate
    * lands on the physical parquet column, so it reaches PushedFilters
    * and prunes row groups by their int64 min/max stats. A bound on the
    * *converted* timestamp would sit above a computed column and never
    * reach the scan. */
  def eventsRange(s: SparkSession, d: String,
      nanos: Option[(Long, Long)]): DataFrame = {
    // runtime-settable legacy conf; set defensively so events reads work
    // even in sessions the caller built without it (e.g. the driver's)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType =>
        val bounded = nanos.fold(df) { case (lo, hi) =>
          df.filter(col("ts") >= lo && col("ts") < hi)
        }
        bounded.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        // TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet. Bound with
        // LocalDateTime (NTZ) literals so the predicate stays on the
        // physical column and reaches PushedFilters — an Instant literal
        // here makes the analyzer cast the COLUMN, which floats the
        // predicate above the scan and kills row-group pruning. Then cast
        // to TimestampType (session tz is UTC ⇒ same instants as the old
        // nanos path) so downstream unix_seconds/unix_micros analyze.
        val bounded = nanos.fold(df) { case (lo, hi) =>
          df.filter(col("ts") >= lit(ntzMicros(ceilDivNanos(lo))) &&
            col("ts") < lit(ntzMicros(ceilDivNanos(hi))))
        }
        bounded.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType =>
        // TIMESTAMP(MICROS, isAdjustedToUTC=true): Instant literals match
        // the column type natively, so the bound pushes down as-is.
        nanos.fold(df) { case (lo, hi) =>
          df.filter(
            col("ts") >= lit(instantMicros(ceilDivNanos(lo))) &&
            col("ts") < lit(instantMicros(ceilDivNanos(hi))))
        }
      case other =>
        throw new IllegalStateException(
          s"events.ts has unsupported storage type $other; expected " +
            "int64 nanos, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }

  /** ns → µs with ceiling semantics: the stored column is µs-aligned, so
    * for both `ts >= lo` and `ts < hi` the equivalent µs bound is
    * ceil(bound/1000) (truncation would admit rows just below `lo`).
    */
  private def ceilDivNanos(n: Long): Long = math.floorDiv(n + 999L, 1000L)

  private def ntzMicros(us: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      math.floorDiv(us, 1000000L), (math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)

  private def instantMicros(us: Long): java.time.Instant =
    java.time.Instant.ofEpochSecond(
      math.floorDiv(us, 1000000L), math.floorMod(us, 1000000L) * 1000L)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Scale-adaptive scan fan-out for CPU-heavy per-row pipelines (gram
    * hashing, shingle/signature builds, LM scoring, classifier feature
    * builds — the paths that do thousands of hash/string operations per
    * input row before their first aggregation).
    *
    * A local test corpus arrives as ONE parquet file with ONE row group,
    * so its scan is a single task no matter how many cores the session
    * has (`openCostInBytes` floors the split size at 4 MB, and a single
    * row group cannot split below that anyway) — measured at sf0.1 this
    * serialized the whole md5-per-trigram feature build of
    * text_langid_clf onto one core (10.0 s of a 32-core box). When the
    * scan's planned parallelism is below the session default, ONE
    * round-robin exchange of the narrow input rows redistributes them
    * before the heavy map; the exchanged bytes are the raw text/vector
    * rows (tiny precisely when this branch fires). At production scale
    * the file count exceeds the core count and this is the identity —
    * no code path here ever shuffles a large input, because a large
    * input always arrives already split. Never applied to map-only
    * payload operators (mm_*, docs_chunk, emb_pq — PlanAuditSpec pins
    * those to zero exchanges; shuffling payload bytes is the exact
    * anti-pattern the optimization guide's worked example removes). */
  def fanOutScan(df: DataFrame, spark: SparkSession, dir: String): DataFrame =
    fanOutScan(df, spark, dir, sys.env.contains("SPARK_GRAFT_NO_FANOUT"))

  /** The env kill switch resolved at the call boundary so the A/B
    * escape hatch is spec-able (FanOutScanSpec) without forking a JVM
    * with a modified environment. */
  private[graft] def fanOutScan(df: DataFrame, spark: SparkSession,
      dir: String, disabled: Boolean): DataFrame = {
    if (disabled) return df
    val p = spark.sparkContext.defaultParallelism
    if (scanParallelism(spark, dir) < p) df.repartition(p) else df
  }

  // per-(session, corpus dir) memo of the documents scan's planned
  // split count — the probe behind fanOutScan. r19 probed the CALLER'S
  // derived frame via Dataset.rdd, which under AQE forces
  // getFinalPhysicalPlan() and eagerly RUNS any upstream query stages
  // (tombstone distincts, broadcast builds) as real Spark jobs just to
  // read a partition count — paid once for the discarded probe RDD and
  // again at execution — plus a full analyze/optimize pass per call.
  // The split count is a pure function of (file layout, session read
  // confs), so probe the RAW documents scan — a leaf plan, no stages
  // to materialize — once per (session, dir) and reuse the decision.
  private val scanPartsCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Int]]()

  private def scanParallelism(spark: SparkSession, dir: String): Int = {
    val memo = scanPartsCache.synchronized {
      Option(scanPartsCache.get(spark)).getOrElse {
        val m = scala.collection.concurrent.TrieMap.empty[String, Int]
        scanPartsCache.put(spark, m)
        m
      }
    }
    memo.getOrElseUpdate(dir,
      documents(spark, dir).rdd.getNumPartitions)
  }
}
