package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.GeoTiff

/** Streaming archive-watch ingestion: the continuous sibling of
  * [[GeoTiff.readCube]].
  *
  * A production SKOPE archive grows — new acquisition years land as new
  * GeoTIFF granules. The batch bridge re-reads the directory; this one
  * watches it: Structured Streaming's file source lists new granules
  * per trigger (its own commit log remembers which files are done, so a
  * granule is decoded EXACTLY ONCE across restarts), each decodes
  * executor-side through the same [[GeoTiff.cellsOf]] iterator, and the
  * parquet sink appends long-format cube rows with the sink commit
  * log's exactly-once file semantics — the same recovery contract
  * EventStreamSpec proves for the events pipeline.
  *
  * Scale shape: a granule is one task (file-level parallelism, like the
  * batch path); `maxFilesPerTrigger` bounds a backfill burst so one
  * trigger's work fits the cluster; nothing touches the driver but the
  * file listing.
  */
object GeoTiffStream {

  /** The binaryFile source's fixed schema, spelled explicitly — a
    * streaming file source refuses schema inference by design (a
    * schema that shifted between restarts would corrupt recovery). */
  private val BinaryFileSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "path STRING, modificationTime TIMESTAMP, length BIGINT, content BINARY")

  /** New-granule stream → long-format cube rows. */
  def readCubeStream(spark: SparkSession, dirGlob: String,
      maxFilesPerTrigger: Int = 16): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .schema(BinaryFileSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dirGlob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) => GeoTiff.cellsOf(path, content) }
      .toDF()
  }

  /** Append the granule stream into a parquet cube table; one call per
    * trigger cycle (AvailableNow drains everything currently listed,
    * then stops — the scheduled-backfill shape; a `ProcessingTime`
    * trigger would tail the archive continuously instead). */
  def ingestAvailable(cells: DataFrame, outPath: String,
      checkpoint: String): StreamingQuery =
    cells.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
}
