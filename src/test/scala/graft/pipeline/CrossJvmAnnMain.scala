package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Child-JVM entry for CrossJvmAnnSpec — the ANN twin of
  * CrossJvmIndexMain: `build` trains the codebooks/centroids and
  * writes the sidecar + code tables into a persistent Hive/Derby
  * catalog; `query` runs in a SECOND JVM, refuses to retrain (require
  * on catalog presence of all five artifacts), runs the trained and
  * residual ADC searches purely off the stored index, and prints the
  * machine-checkable facts the spec asserts on (including the
  * partition-pruned scan proof).
  */
object CrossJvmAnnMain {
  def main(args: Array[String]): Unit = {
    val Array(mode, sfDir, work) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-xjvm-ann-$mode")
      .config("spark.sql.warehouse.dir", s"$work/warehouse")
      .config("spark.sql.catalogImplementation", "hive")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$work/metastore_db;create=true")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try mode match {
      case "build" =>
        Similarity.codeTable(spark, sfDir, "trained")
        Similarity.codeTable(spark, sfDir, "residual")
        println("XJVM BUILT")

      case "query" =>
        // the proof needs the catalog to ALREADY hold every artifact —
        // a silent retrain here would pass the equality check while
        // proving nothing about persistence
        val names = spark.catalog.listTables().collect().map(_.name)
        println("XJVM TABLES " + names.sorted.mkString(","))
        Seq("graft_anncb_pqt_", "graft_anncb_pqres_", "graft_anncb_ivfcc_",
          "graft_anncodes_trained_", "graft_anncodes_residual_").foreach(p =>
          require(names.exists(_.startsWith(p)),
            s"$p absent from the fresh JVM's catalog"))
        def dump(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          println(s"XJVM SCAN_$tag " + plan.contains("graft_anncodes_"))
          println(s"XJVM PRUNE_$tag " + plan.split("\n").exists(l =>
            l.contains("PartitionFilters") && l.contains("cent_id")))
          df.collect().map(r =>
            (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
            .sortBy(t => (t._1, t._2))
            .foreach(t => println(s"XJVM ROW_$tag ${t._1} ${t._2} ${t._3} ${t._4}"))
        }
        dump("T", Similarity.annIvfPqTrained(spark, sfDir))
        dump("R", Similarity.annIvfPqResidual(spark, sfDir))

      // encode-only maintenance from ANOTHER fresh JVM: fold a batch
      // of probe-vector copies into the stored trained index — the
      // require proves no retrain path opened (the sidecars and code
      // table must already be in the catalog)
      case "fold" =>
        import org.apache.spark.sql.functions._
        val names = spark.catalog.listTables().collect().map(_.name)
        require(names.exists(_.startsWith("graft_anncodes_trained_")),
          "fold JVM requires the previously-built index")
        val batch = Similarity.normedOfBatch(
          graft.Tables.embeddings(spark, sfDir)
            .filter(col("vec_id") < Similarity.NumProbes)
            .withColumn("vec_id", col("vec_id") + 1000000L))
        val n = Similarity.appendAnnToIndex(spark, sfDir, batch, "trained")
        println(s"XJVM FOLDED $n")

      // and a FOURTH JVM serves the fold purely off the catalog: each
      // probe must retrieve its appended exact copy
      case "served" =>
        val hits = Similarity.annIvfPqTrained(spark, sfDir).collect()
          .map(r => (r.getLong(0), r.getLong(2))).toSet
        val ok = (0L until Similarity.NumProbes)
          .forall(p => hits((p, p + 1000000L)))
        println(s"XJVM SERVED $ok")
    } finally spark.stop()
  }
}
