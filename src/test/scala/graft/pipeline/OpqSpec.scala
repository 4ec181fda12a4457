package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** OPQ dimension allocation (r14 verdict item 4): the rotation family
  * restricted to a permutation — structural pins here; exactness of
  * the allocation + trainer + ADC end-to-end is the driver oracle's
  * job (emb_pq_opq / ann_ivfpq_opq / ann_ivfpq_opq_recall). */
class OpqSpec extends SparkSpec {

  test("opqPermutation is a bijection in snake-balanced order") {
    val perm = Similarity.opqPermutation(spark, sfDir)
    assert(perm.length === Similarity.Dim)
    assert(perm.toSet === (0 until Similarity.Dim).toSet,
      "permutation must be a bijection over the dims")
    // balanced allocation: recompute the variance ranking the trainer
    // used and check each subspace holds exactly one dim per rank
    // round (the snake deal's defining property)
    val m = Similarity.PqMTrained
    val sd = Similarity.PqSubDimTrained
    val stats = graft.Tables.embeddings(spark, sfDir)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(graft.Num.roundEps(avg(col("x").cast("double")), 6).as("mu"),
        graft.Num.roundEps(
          avg(col("x").cast("double") * col("x").cast("double")), 6).as("m2"))
      .collect()
      .map(r => (r.getInt(0), graft.Num.roundEpsJvm(
        r.getDouble(2) - r.getDouble(1) * r.getDouble(1), 6)))
    val rankOf = stats.sortBy { case (d, v) => (-v, d) }
      .map(_._1).zipWithIndex.toMap
    (0 until m).foreach { s =>
      val rounds = (0 until sd).map(slot => rankOf(perm(s * sd + slot)) / m)
      assert(rounds.sorted === (0 until sd),
        s"subspace $s holds rank rounds $rounds — not one per round")
    }
  }

  test("permutation training is deterministic and sidecar-persisted") {
    val p1 = Similarity.opqPermutation(spark, sfDir)
    val p2 = Similarity.opqPermutation(spark, sfDir)
    assert(p1.toSeq === p2.toSeq)
    val tbl = spark.catalog.listTables().collect().map(_.name)
      .filter(_.startsWith("graft_anncb_opqperm_"))
    assert(tbl.nonEmpty, "opq permutation sidecar missing")
  }

  test("OPQ ADC-only recall holds the trained family's floor") {
    val avg0 = Similarity.annIvfPqOpqRecall(spark, sfDir)
      .agg(avg(col("recall"))).collect()(0).getDouble(0)
    assert(avg0 >= 0.5,
      s"OPQ ADC-only avg recall $avg0 below the trained-family floor")
  }
}
