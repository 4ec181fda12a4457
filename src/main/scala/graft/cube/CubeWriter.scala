package graft.cube

import graft.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Write-time materialization of the event cube — the 100 TB layout.
  *
  * The reference reads a raster file per (dataset, variable) and slices
  * bands on demand (core/services.py:149-166). The Spark-native
  * equivalent is a long-format parquet cube partitioned by dataset_id:
  *
  *   out/dataset_id=click/part-*.parquet   (rows sorted by band)
  *
  * so a query for one dataset touches one partition directory
  * (partition pruning — `PartitionFilters` in the scan), and a band
  * range slice prunes row groups via the parquet min/max stats the
  * within-partition band sort produces. At 1000 executors this is the
  * difference between a full-table scan and reading a few files.
  */
object CubeWriter {

  /** The full cube across all datasets: (dataset_id, band, user_id,
    * x, y, v). One shuffle on (dataset, band, cell). */
  def fullCube(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        col("event_type").as("dataset_id"),
        (datediff(to_date(col("ts")), lit(EventCube.Origin).cast("date")) + 1)
          .cast("long").as("band"),
        col("user_id"))
      .agg(avg(col("value")).as("v"))
      .withColumn("x", col("user_id") % EventCube.GridWidth)
      .withColumn("y",
        floor(col("user_id") / lit(EventCube.GridWidth.toDouble)).cast("long"))

  /** Materialize: hash-cluster by dataset, band-sort within files. */
  def materialize(spark: SparkSession, dir: String, outPath: String): Unit =
    fullCube(spark, dir)
      .repartition(col("dataset_id"))
      .sortWithinPartitions(col("band"), col("user_id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("dataset_id")
      .parquet(outPath)

  /** Read one dataset's band slice from a materialized cube — the plan
    * must show PartitionFilters (dataset pruning) and a band range
    * reaching PushedFilters (row-group pruning). */
  def readSlice(spark: SparkSession, cubePath: String, dataset: String,
      bandLo: Int, bandHi: Int): DataFrame =
    spark.read.parquet(cubePath)
      .filter(col("dataset_id") === dataset &&
        col("band").between(bandLo, bandHi))
}
