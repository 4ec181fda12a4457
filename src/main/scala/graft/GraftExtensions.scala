package graft

import graft.functions.{DotProduct, Fingerprint31, L2Norm, MinHashBands, QuantizeStats, Shingle3SortedHashes, SimHash60, SortedIntersectCount, TopKAgg}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so
  * `spark.sql("SELECT dot_product(a, b)")` works in pure SQL jobs.
  *
  * Use at session build time:
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  * or via config:
  *   spark.sql.extensions=graft.GraftExtensions
  * or at runtime on an existing session: GraftExtensions.registerAll.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("l2_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "l2_norm"),
      (exprs: Seq[Expression]) => L2Norm(exprs.head)))
    e.injectFunction((FunctionIdentifier("shingle3_sorted_hashes"),
      new ExpressionInfo(classOf[Shingle3SortedHashes].getName, "shingle3_sorted_hashes"),
      (exprs: Seq[Expression]) => Shingle3SortedHashes(exprs.head)))
    e.injectFunction((FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      (exprs: Seq[Expression]) => MinHashBands(exprs.head)))
    e.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (exprs: Seq[Expression]) => SimHash60(exprs.head)))
    e.injectFunction((FunctionIdentifier("fingerprint31"),
      new ExpressionInfo(classOf[Fingerprint31].getName, "fingerprint31"),
      (exprs: Seq[Expression]) => Fingerprint31(exprs.head)))
    e.injectFunction((FunctionIdentifier("quantize_stats"),
      new ExpressionInfo(classOf[QuantizeStats].getName, "quantize_stats"),
      (exprs: Seq[Expression]) => QuantizeStats(exprs.head)))
    e.injectFunction((FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKAgg].getName, "top_k"),
      (exprs: Seq[Expression]) => GraftExtensions.topK(exprs)))
    // deployment-policy rewrite: exact percentile → sketch when
    // spark.graft.approxPercentile is set (plans/ApproxPercentileRule)
    e.injectOptimizerRule(graft.plans.ApproxPercentileRule.apply)
    // whole-operator extension: the as-of join physical strategy
    // (plans/AsofJoin — ladder rung (c))
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftExtensions {
  /** top_k(score, id, k) — k must be a foldable integer literal. */
  private[graft] def topK(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "top_k(score, id, k)")
    require(exprs(2).foldable, "top_k's k must be a literal")
    TopKAgg(exprs(0), exprs(1),
      exprs(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression()
  }

  /** Runtime registration for sessions built elsewhere. */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_norm", exprs => L2Norm(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle3_sorted_hashes", exprs => Shingle3SortedHashes(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_bands", exprs => MinHashBands(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", exprs => SimHash60(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fingerprint31", exprs => Fingerprint31(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantize_stats", exprs => QuantizeStats(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k", exprs => topK(exprs), "built-in")
  }
}
