package graft

import org.apache.spark.sql.SparkSession

// throwaway profiling harness — not part of the library surface
object Scratch {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"TIMING $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "200")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.toList match {
      case "cc" :: Nil =>
        import org.apache.spark.sql.functions._
        time("warmup q1")(SparkEntry.queries("q1_pricing")(spark, dir).count())
        val pairs = time("lsh pairs")(
          graft.pipeline.Dedup.minhashLsh(spark, dir)
            .select(col("d1"), col("d2")).persist())
        time("pairs count")(println("pairs=" + pairs.count()))
        val edges = pairs.unionAll(pairs.select(col("d2"), col("d1")))
          .toDF("src", "dst").persist()
        time("edges count")(println("edges=" + edges.count()))
        var labels = edges
          .select(col("src").as("id"), col("dst").as("label"))
          .unionAll(edges.select(col("src"), col("src")))
          .groupBy(col("id")).agg(min(col("label")).as("label")).persist()
        time("init labels")(println("labels=" + labels.count()))
        (1 to 3).foreach { r =>
          val prop = edges.join(labels, edges("dst") === labels("id"))
            .select(col("src").as("id"), col("label"))
            .unionAll(labels)
            .groupBy(col("id")).agg(min(col("label")).as("label")).persist()
          time(s"round $r prop+count") {
            val changed = prop.join(labels.withColumnRenamed("label", "old"), "id")
              .filter(col("label") < col("old")).limit(1).count()
            println(s"changed=$changed")
          }
          labels = prop
        }
      case "sh" :: Nil =>
        // stage split for dedup_simhash: signature MD5s vs 120-key
        // posting explode vs the bucket self-join + verification
        import org.apache.spark.sql.functions._
        import graft.functions.HashFunctions.simhash60
        time("warmup q1")(SparkEntry.queries("q1_pricing")(spark, dir).count())
        val sigs = time("sigs build") {
          val s = Tables.documents(spark, dir)
            .select(col("doc_id"), simhash60(split(col("text"), " ")).as("sim"))
            .persist()
          s.count(); s
        }
        val chunkKeys = (0 until 10).combinations(3).toSeq.zipWithIndex.map {
          case (Seq(a, b, c), t) =>
            expr(s"${t.toLong << 18}L" +
              s" + shiftleft(shiftright(sim, ${6 * a}) & 63, 12)" +
              s" + shiftleft(shiftright(sim, ${6 * b}) & 63, 6)" +
              s" + (shiftright(sim, ${6 * c}) & 63)")
        }
        // A/B: the retired 120-expression spelling (kept here ONLY to
        // measure its codegen-compile constant) vs the production kernel
        val postings = time("postings build (expr spelling, retired)") {
          val p = sigs
            .select(col("doc_id"), col("sim"),
              explode(array(chunkKeys: _*)).as("k"))
            .select(col("k"), col("doc_id"), col("sim"),
              expr("shiftright(k, 18)").as("t")).persist()
          p.count(); p
        }
        time("postings build (production kernel)") {
          import graft.functions.HashFunctions.simhash_triple_keys
          sigs.select(col("doc_id"), col("sim"),
            explode(simhash_triple_keys(col("sim"))).as("k")).count()
        }
        println("postings rows=" + postings.count())
        println("multi-buckets=" + postings.groupBy("k").count()
          .filter(col("count") > 1).count())
        graft.pipeline.ArtifactCache.clear()
        time("d_sh cold")(graft.pipeline.Dedup.simhash(spark, dir).count())
        time("d_sh warm-artifacts")(
          graft.pipeline.Dedup.simhash(spark, dir).count())
      case "dump" :: q :: out :: Nil =>
        // one-query Verify: parquet dump + its oracle SQL, for fast
        // local DuckDB iteration without the full 82-query pass
        SparkEntry.queries(q)(spark, dir).coalesce(1)
          .write.mode("overwrite").parquet(s"$out/$q")
        SparkEntry.oracleSql.get(q).foreach(sql =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$out/$q.sql"), sql))
      case "explain" :: qs =>
        qs.foreach { q =>
          println(s"==== $q ====")
          SparkEntry.queries(q)(spark, dir).explain("formatted")
        }
      case qs =>
        time("warmup q1")(SparkEntry.queries("q1_pricing")(spark, dir).count())
        for (q <- qs) {
          time(s"$q run1")(SparkEntry.queries(q)(spark, dir).count())
          time(s"$q run2")(SparkEntry.queries(q)(spark, dir).count())
        }
    }
    spark.stop()
  }
}
