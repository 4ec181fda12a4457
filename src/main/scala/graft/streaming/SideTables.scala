package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** The side-table plumbing every continuous-dedup stream shares
  * (DedupStream / SimhashStream / SemanticStream): batch_id-partitioned
  * parquet side tables written with dynamic partition overwrite (the
  * effectively-exactly-once contract — a replayed batch rewrites its
  * own partition with identical content), read back either strictly
  * BEFORE a batch id (the replay-deterministic probe view) or in full
  * (the restart-time fold).
  *
  * Existence checks go through the HADOOP filesystem of the path, not
  * java.io.File: a non-local sinkPath (hdfs://, s3a://) is written via
  * Hadoop, so a local-File probe would read it as absent and silently
  * drop every cross-batch pair and skip every restart fold. */
private[streaming] object SideTables {

  def exists(spark: SparkSession, path: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** Rows of every batch strictly BEFORE `batchId` — the view a
    * replayed micro-batch must see (its own prior write excluded). */
  def sideRead(spark: SparkSession, path: String, schema: StructType,
      batchId: Long): DataFrame =
    if (exists(spark, path))
      spark.read.schema(schema.add("batch_id", LongType))
        .option("basePath", path).parquet(path)
        .filter(col("batch_id") < batchId)
        .drop("batch_id")
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)

  /** Every batch's rows — the restart-time fold input. */
  def readAll(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema.add("batch_id", LongType))
      .option("basePath", path).parquet(path).drop("batch_id")

  def overwritePartition(df: DataFrame, batchId: Long,
      path: String): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)

  def delete(spark: SparkSession, path: String): Unit = {
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(hp, true)
  }
}
