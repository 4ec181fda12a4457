package graft.sources

import graft.{SparkSpec, Tables}
import java.nio.file.Files

class TableIOSpec extends SparkSpec {

  private def roundTrip(fmt: TableIO.Format, table: String): Unit = {
    val df = Tables.load(spark, sfDir, table)
    val dir = Files.createTempDirectory(s"graft_io_${fmt.name}").toString
    TableIO.write(df, dir, fmt)
    val back = TableIO.read(spark, dir, fmt, df.schema)
    assert(back.schema == df.schema, s"$fmt schema drift")
    val a = df.collect().map(_.toString).sorted
    val b = back.collect().map(_.toString).sorted
    assert(a.sameElements(b), s"$fmt round-trip of $table lost rows")
  }

  test("csv round-trips a flat table with explicit schema") {
    roundTrip(TableIO.Csv, "customer")
  }

  test("json round-trips documents") {
    roundTrip(TableIO.Json, "documents")
  }

  test("parquet round-trips lineitem with partitioning") {
    val df = Tables.lineitem(spark, sfDir)
    val dir = Files.createTempDirectory("graft_io_part").toString
    TableIO.write(df, dir, TableIO.Parquet, partitionBy = Seq("l_returnflag"))
    val back = TableIO.read(spark, dir, TableIO.Parquet, df.schema)
    assert(back.count() == df.count())
    // partition layout exists on disk
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("l_returnflag=")))
  }

  test("csv refuses nested columns instead of silently stringifying") {
    val df = Tables.embeddings(spark, sfDir)
    val dir = Files.createTempDirectory("graft_io_bad").toString
    intercept[IllegalArgumentException] {
      TableIO.write(df, dir, TableIO.Csv)
    }
  }

  test("timestamps survive csv with microsecond precision") {
    val df = Tables.events(spark, sfDir).select("event_id", "ts", "value")
    val dir = Files.createTempDirectory("graft_io_ts").toString
    TableIO.write(df, dir, TableIO.Csv)
    val back = TableIO.read(spark, dir, TableIO.Csv, df.schema)
    val a = df.collect().map(_.toString).sorted
    val b = back.collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
