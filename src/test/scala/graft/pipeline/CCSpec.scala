package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Differential coverage for the two connected-components engines:
  * min-label propagation (O(diameter) rounds — the near-dup fast path)
  * and alternating large-star/small-star (O(log n) rounds — the
  * escalation path for pathological diameters, per Kiveris et al.,
  * "Connected Components in MapReduce and Beyond"). Both must agree
  * with an in-memory union-find on random graphs, and the escalation
  * must kick in exactly when the round cap is exceeded. */
class CCSpec extends SparkSpec {

  private def pairsDf(edges: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    edges.toDF("d1", "d2")
  }

  /** In-memory truth: union-find, label = component minimum. */
  private def truthLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.foreach { case (a, b) => union(a, b) }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def collect(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("both engines match union-find on random graphs") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 80
      val edges = (0 until 70).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val truth = truthLabels(edges)
      val viaMinLabel = collect(
        Dedup.minLabelCC(spark, pairsDf(edges)).get)
      val viaTwoPhase = collect(Dedup.twoPhaseCC(spark, pairsDf(edges)))
      assert(viaMinLabel === truth, s"min-label diverges (seed $seed)")
      assert(viaTwoPhase === truth, s"two-phase diverges (seed $seed)")
    }
  }

  test("two-phase CC collapses a path graph deeper than the label-round cap") {
    // a 121-node chain: diameter 120 — min-label propagation cannot
    // finish in 50 rounds, large-star/small-star needs ~log n
    val chain = (0L until 120L).map(i => (i, i + 1))
    assert(Dedup.minLabelCC(spark, pairsDf(chain), maxRounds = 50).isEmpty,
      "min-label should report non-convergence on a 120-diameter chain")
    val labels = collect(Dedup.twoPhaseCC(spark, pairsDf(chain)))
    assert(labels.size === 121)
    assert(labels.values.toSet === Set(0L), "one component rooted at 0")
    // and the composed escalation (the clusters code path) succeeds
    val composed = collect(
      Dedup.minLabelCC(spark, pairsDf(chain), maxRounds = 50)
        .getOrElse(Dedup.twoPhaseCC(spark, pairsDf(chain))))
    assert(composed === labels)
  }

  test("two-phase CC on an adversarial high-degree hub plus clique mix") {
    // star hub (node 0 ↔ 1..200) unioned with a disjoint clique and a
    // singleton pair — degree skew stresses the per-node min agg
    val hub = (1L to 200L).map(i => (0L, i))
    val clique = for {
      a <- 500L to 505L; b <- 500L to 505L if a < b
    } yield (a, b)
    val edges = hub ++ clique ++ Seq((900L, 901L))
    val truth = truthLabels(edges)
    assert(collect(Dedup.twoPhaseCC(spark, pairsDf(edges))) === truth)
    assert(collect(Dedup.minLabelCC(spark, pairsDf(edges)).get) === truth)
  }

  test("empty pair list yields empty labels from both engines") {
    val empty = pairsDf(Seq.empty)
    assert(Dedup.minLabelCC(spark, empty).get.count() === 0)
    assert(Dedup.twoPhaseCC(spark, empty).count() === 0)
  }
}
