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

  // ------------------------------------------------- top-k + whiten --

  test("k=4: unit-norm, pairwise near-orthogonal, pc1/pc2 unchanged") {
    val (_, comps) = Similarity.pcaStateK(spark, sfDir)
    assert(comps.length === Similarity.PcaK)
    comps.zipWithIndex.foreach { case (v, j) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-4, s"pc${j + 1} norm $n")
    }
    // the 6-dp per-round grid holds orthogonality through pc4 (the
    // r13 open question): measure every pair, not just v1·v2
    for (a <- comps.indices; b <- comps.indices if a < b) {
      val dot = comps(a).indices.map(d => comps(a)(d) * comps(b)(d)).sum
      assert(math.abs(dot) < 2e-3,
        s"pc${a + 1}·pc${b + 1} = $dot - deflation drifted off the grid")
    }
    // the generalized recursion reduces to the r13 state at k <= 2
    val (_, v1, v2) = Similarity.pcaState(spark, sfDir)
    assert(comps(0).toSeq === v1.toSeq)
    assert(comps(1).toSeq === v2.toSeq)
  }

  test("whitened coordinates have unit population variance per axis") {
    val rows = Similarity.embWhiten(spark, sfDir).collect()
    (1 to Similarity.PcaK).foreach { j =>
      val ws = rows.map(_.getAs[Double](s"w$j"))
      val m = ws.sum / ws.length
      val v = ws.map(w => (w - m) * (w - m)).sum / ws.length
      // variance of s_j/sqrt(var_j) is 1 up to the projection's mean
      // offset (scores are centered only up to 6-dp rounding)
      assert(math.abs(v - 1.0) < 2e-2, s"w$j variance $v")
    }
  }

  test("explained variance is non-increasing across components") {
    val (mu, comps) = Similarity.pcaStateK(spark, sfDir)
    val rows = graft.Tables.embeddings(spark, sfDir)
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    val vars = comps.map { v =>
      val ss = rows.map { x =>
        x.indices.map(d => (x(d) - mu(d)) * v(d)).sum
      }
      val m = ss.sum / ss.length
      ss.map(s => (s - m) * (s - m)).sum / ss.length
    }
    vars.sliding(2).foreach { case Array(a, b) =>
      // 2% slack: fixed 8-round convergence, not an exact eigenbasis
      assert(b <= a * 1.02, s"variance order violated: ${vars.mkString(", ")}")
    }
  }
}
