package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Child-JVM entry for CrossJvmIndexSpec — the airtight version of the
  * fresh-session read-back proof. IncrementalDedupSpec's
  * `spark.newSession()` shares the catalog with the builder session;
  * here the catalog itself persists (Hive catalog over an embedded
  * Derby metastore pointed at the spec's scratch dir), so a BRAND-NEW
  * SparkContext in a BRAND-NEW JVM must rediscover the bucketed index
  * tables purely from disk: Derby for the table + bucket-spec
  * metadata, the external parquet paths for the data. `build` writes
  * the index; `delta` runs in a second JVM, refuses to rebuild
  * (require on catalog presence), runs the delta pass, and prints the
  * machine-checkable facts the spec asserts on.
  */
object CrossJvmIndexMain {
  def main(args: Array[String]): Unit = {
    val Array(mode, sfDir, work) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-xjvm-$mode")
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
        Dedup.minhashIndexTable(spark, sfDir)
        Dedup.shingleIndexTable(spark, sfDir)
        println("XJVM BUILT")

      case "delta" =>
        // the proof needs the catalog to ALREADY hold the tables —
        // a silent rebuild here would pass the equality check while
        // proving nothing about persistence
        val names = spark.catalog.listTables().collect().map(_.name)
        println("XJVM TABLES " + names.sorted.mkString(","))
        require(names.exists(_.startsWith("graft_minhash_idx_")) &&
          names.exists(_.startsWith("graft_shingles_")),
          "index tables absent from the fresh JVM's catalog")
        val inc = Dedup.incremental(spark, sfDir)
        val plan = inc.queryExecution.executedPlan.toString()
        println("XJVM PLAN_MINHASH " + plan.contains("graft_minhash_idx"))
        println("XJVM PLAN_SHINGLES " + plan.contains("graft_shingles"))
        // bucket spec survived the metastore round-trip: the
        // shuffle-strategy probe still needs ZERO Exchange on the
        // index side (only the non-bucketed delta stand-in shuffles)
        val index = Dedup.minhashIndexTable(spark, sfDir)
        import spark.implicits._
        val delta = index.limit(50).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq.toDF("k", "dd")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val probe = index.join(delta.hint("shuffle_hash"), "k")
          .queryExecution.executedPlan.toString()
        println("XJVM SHJ " + probe.contains("ShuffledHashJoin"))
        println("XJVM EXCHANGES " +
          probe.sliding("Exchange".length).count(_ == "Exchange"))
        inc.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .sortBy(p => (p._1, p._2))
          .foreach(p => println(s"XJVM PAIR ${p._1} ${p._2} ${p._3}"))
    } finally spark.stop()
  }
}
