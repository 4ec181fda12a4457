package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic power-iteration PCA (round 13): component geometry,
  * projection invariants, determinism, and the map-only serving plan.
  */
class PcaSpec extends SparkSpec {

  test("components are unit-norm, near-orthogonal and deterministic") {
    val (mu1, v1, u1) = Similarity.pcaState(spark, sfDir)
    val (mu2, v2, u2) = Similarity.pcaState(spark, sfDir)
    assert(mu1.toSeq === mu2.toSeq)
    assert(v1.toSeq === v2.toSeq)
    assert(u1.toSeq === u2.toSeq)
    assert(v1.length === Similarity.Dim)
    Seq(v1, u1).foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-4, s"component norm $n")
    }
    // deflation: pc2 ⟂ pc1 up to the per-round 6-dp rounding
    val dot = v1.indices.map(d => v1(d) * u1(d)).sum
    assert(math.abs(dot) < 1e-3, s"pc1·pc2 = $dot")
  }

  test("projections are centered and capture the dominant variance") {
    val scores = Similarity.embPcaProject(spark, sfDir)
      .collect().map(_.getDouble(1))
    val mean = scores.sum / scores.length
    // (x − μ)·v has zero mean up to the 6-dp rounding of μ and scores
    assert(math.abs(mean) < 1e-3, s"projection mean $mean")
    val varPc = scores.map(s => (s - mean) * (s - mean)).sum / scores.length
    // PC1 variance bounds every coordinate variance (e_d' C e_d ≤ λ1);
    // allow 1% slack for the fixed 8-round convergence + rounding
    val rows = graft.Tables.embeddings(spark, sfDir)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val maxCoordVar = (0 until Similarity.Dim).map { d =>
      val xs = rows.map(_(d))
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }.max
    assert(varPc >= 0.99 * maxCoordVar,
      s"pc1 variance $varPc below max coordinate variance $maxCoordVar")
  }

  test("the projection plan is map-only: no Exchange, no UDF") {
    val plan = Similarity.embPcaProject(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
    assert(!plan.contains("ScalaUDF"), plan)
  }
}
