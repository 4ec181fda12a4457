package graft

/** SQL-surface registration: every native expression is callable from
  * pure SQL after GraftExtensions.registerAll — the
  * SparkSessionExtensions path a spark.sql-only job would use. */
class ExtensionsSpec extends SparkSpec {

  test("all native kernels are callable from pure SQL") {
    GraftExtensions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  l2_norm(array(3.0d, 4.0d)) AS nrm,
        |  fingerprint31('abc') AS fp,
        |  quantize_stats(array(0.5d, -1.0d))[0] AS scale,
        |  sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS ic,
        |  simhash60(array('hello', 'world')) AS sh,
        |  size(shingle3_sorted_hashes(array('a','b','c','d'))) AS ns,
        |  size(minhash_bands(shingle3_sorted_hashes(array('a','b','c','d')))) AS nb
        |""".stripMargin).collect().head
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === 5.0)
    // Σ ascii(c_i)·31^(i-1) mod 1e9+7 for "abc"
    assert(row.getLong(2) === (97L + 98L * 31 + 99L * 31 * 31) % 1000000007L)
    assert(row.getDouble(3) === 127.0)
    assert(row.getInt(4) === 2)
    assert(row.getLong(5) !== 0L)
    assert(row.getInt(6) === 2) // 4 tokens → 2 distinct 3-grams
    assert(row.getInt(7) === graft.pipeline.Dedup.NumBands)
  }

  test("top_k aggregates from pure SQL with a literal k") {
    GraftExtensions.registerAll(spark)
    spark.range(0, 100).selectExpr("CAST(id AS DOUBLE) AS score", "id")
      .createOrReplaceTempView("tk")
    val top = spark.sql(
      "SELECT top_k(score, id, 3) AS t FROM tk").collect().head
      .getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(_.getLong(1)) === Seq(99L, 98L, 97L))
    // non-literal k is rejected at analysis
    intercept[Exception] {
      spark.sql("SELECT top_k(score, id, CAST(rand() * 5 AS INT)) FROM tk").collect()
    }
  }
}
