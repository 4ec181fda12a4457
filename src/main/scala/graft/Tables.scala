package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}
import org.apache.spark.sql.types.LongType

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
      case _ =>
        nanos.fold(df) { case (lo, hi) =>
          df.filter(col("ts") >= lit(java.time.Instant.EPOCH.plusNanos(lo)) &&
            col("ts") < lit(java.time.Instant.EPOCH.plusNanos(hi)))
        }
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
