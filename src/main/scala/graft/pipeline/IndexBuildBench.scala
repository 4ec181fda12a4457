package graft.pipeline

import org.apache.spark.sql.SparkSession

/** The heavy-artifact BUILD bench (r17 verdict item 4): time the
  * index-build family — span index + postings, minhash + shingles,
  * the LM score artifact, the trained-ANN books + code table — and
  * one compactAll sweep, at whatever SPARK_GRAFT_SF_DIR points to
  * (the sf100 ≈ 1000× point is the reason this exists: file-count
  * scaling and driver-side listings are the first 100 TB failure mode
  * the per-query bench cannot see). Reports per-family build seconds,
  * the post-build and post-compact data-file counts per table, and
  * the driver's retained heap — the three numbers that must stay sane
  * as the corpus scales. One JSON line on stdout.
  *
  * Run with its own index root so a shared bench root stays clean:
  * `SPARK_GRAFT_INDEX_DIR=/tmp/graft_index_sf100 \
  *  SPARK_GRAFT_SF_DIR=/tmp/sf100 sbt "runMain
  *  graft.pipeline.IndexBuildBench"`.
  */
object IndexBuildBench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def dataFiles(tbl: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0)
      else if (f.getName.endsWith(".parquet")) 1 else 0
    walk(new java.io.File(graft.sources.TableIO.indexPath(tbl)))
  }

  private def heapMb(): Long = {
    System.gc()
    val r = Runtime.getRuntime
    (r.totalMemory() - r.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = graft.Tables.documents(spark, sfDir).count()
      val vecs = graft.Tables.embeddings(spark, sfDir).count()
      // family filter: the span build's shuffle is ~40–48 B per corpus
      // CHARACTER of incompressible hashed rows — at a corpus a small
      // box's scratch disk can't shuffle, run it separately at the
      // factor the disk affords (SPARK_GRAFT_BUILD_FAMILIES=span)
      val families = sys.env.get("SPARK_GRAFT_BUILD_FAMILIES")
        .map(_.split(",").map(_.trim).toSet)
        .getOrElse(Set("minhash", "span", "lmscore", "ann_trained"))
      val builds = Seq(
        "minhash" -> (() => {
          Dedup.minhashIndexTable(spark, sfDir).count()
          Dedup.shingleIndexTable(spark, sfDir).count()
          ()
        }),
        "span" -> (() => {
          Dedup.spanIndexTable(spark, sfDir).count()
          Dedup.spanPostTable(spark, sfDir).count()
          ()
        }),
        // the DISCOVERY half alone (families=spanidx): the sf100
        // point — the posting table's own storage (~55 GB of
        // incompressible hashed rows at 5M docs) exceeds what this
        // box's disk can hold NEXT TO the discovery scratch, which
        // is a capacity fact about the box, not a plan property; the
        // discovery pass (the r18-measured shuffle ceiling) is
        // benchmarked on its own so the 1000× point stays runnable
        "spanidx" -> (() => { Dedup.spanIndexTable(spark, sfDir).count(); () }),
        "lmscore" -> (() => {
          TrainingPrep.bigramScoredTable(spark, sfDir).count()
          ()
        }),
        // the image-signature codec pass alone (r19 verdict item 8):
        // the PAIR query is output-quadratic on short-doc corpora (the
        // all-zero trailing bands put ~44% of docs in one band bucket),
        // so the scale point that matters is the per-generation build —
        // run it twice (fresh JVM) for the cold/warm pair
        "mm" -> (() => { Multimodal.dhashSigs(spark, sfDir).count(); () }),
        "ann_trained" -> (() => {
          Similarity.codeTable(spark, sfDir, "trained").count()
          ()
        }))
        .filter { case (k, _) => families(k) }
        .map { case (k, f) => k -> time(f()) }
      val tables = spark.catalog.listTables().collect().map(_.name)
        .filter(n => n.startsWith("graft_") &&
          n.contains(sfDir.replaceAll("[^A-Za-z0-9]", "_")))
      val filesBefore = tables.map(t => t -> dataFiles(t)).toMap
      val heapAfterBuild = heapMb()
      val compactSec = time { Maintenance.compactAll(spark, sfDir); () }
      val filesAfter = tables.map(t => t -> dataFiles(t)).toMap
      val slug = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      def fileJson(m: Map[String, Int]) = m.toSeq.sortBy(_._1)
        .map { case (t, n) =>
          // strip the dir-slug+fingerprint tail: a stable, readable key
          val i = t.indexOf("_" + slug)
          val short = if (i > 0) t.take(i) else t
          s""""$short":$n"""
        }.mkString("{", ",", "}")
      val buildJson = builds
        .map { case (k, s) => s""""$k":${f"$s%.1f"}""" }.mkString(",")
      println(s"""{"metric":"index_build","unit":"sec"""" +
        s""","sf_dir":"$sfDir","docs":$docs,"vecs":$vecs""" +
        s""",$buildJson,"compact":${f"$compactSec%.1f"}""" +
        s""","heap_mb":$heapAfterBuild,"heap_mb_final":${heapMb()}""" +
        s""","files":${fileJson(filesBefore)}""" +
        s""","files_compacted":${fileJson(filesAfter)}}""")
    } finally spark.stop()
  }
}
