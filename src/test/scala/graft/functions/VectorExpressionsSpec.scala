package graft.functions

import graft.{GraftExtensions, SparkSpec}

class VectorExpressionsSpec extends SparkSpec {

  test("hash kernels register in SQL and agree with their Column API") {
    GraftExtensions.registerAll(spark)
    val row = spark.sql(
      """SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS c,
        |  size(minhash_bands(shingle3_sorted_hashes(split('a b c d', ' ')))) AS nb,
        |  simhash60(split('a b c', ' ')) AS sh""".stripMargin).collect().head
    assert(row.getInt(0) == 2)
    assert(row.getInt(1) == graft.pipeline.Dedup.NumBands)
    // same tokens through the kernel directly
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val arr = new GenericArrayData(
      Array("a", "b", "c").map(UTF8String.fromString(_)))
    assert(row.getLong(2) == HashKernels.simhash60(arr))
  }

  test("dot_product and l2_norm evaluate correctly and register in SQL") {
    GraftExtensions.registerAll(spark)
    val row = spark.sql(
      """SELECT dot_product(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d,
        |       l2_norm(array(3.0D, 4.0D)) AS n""".stripMargin).collect().head
    assert(row.getDouble(0) == 32.0)
    assert(row.getDouble(1) == 5.0)
  }

  test("expressions survive whole-stage codegen over a real column") {
    GraftExtensions.registerAll(spark)
    import spark.implicits._
    val df = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 2.0)))
      .toDF("id", "v")
    df.createOrReplaceTempView("vex")
    val out = spark.sql(
      "SELECT id, dot_product(v, v) AS d, l2_norm(v) AS n FROM vex ORDER BY id")
      .collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(1.0, 4.0))
    assert(out.map(_.getDouble(2)).toSeq == Seq(1.0, 2.0))
  }

  test("null input yields null, not a crash") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql("SELECT dot_product(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D))").collect().head
    assert(r.isNullAt(0))
  }
}
