package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** AS-OF JOIN as a first-class operator — the one whole-operator
  * semantics Spark's built-ins cannot express without a detour
  * (union + windowed last_value, or an exploding range join): for each
  * left row, attach the single right row with the same key and the
  * greatest right-time at-or-before (or strictly before) the left
  * row's time.
  *
  * This is rung (c) of the extension ladder: a custom `LogicalPlan`
  * node, a `SparkStrategy`, and a `SparkPlan` whose
  * requiredChildDistribution / requiredChildOrdering let
  * EnsureRequirements plan the exchanges and sorts — so the physical
  * work is ONE co-partitioned merge scan per partition, with O(1)
  * state (the current backward candidate), never a buffered window or
  * a candidate explosion. Registered through SparkSessionExtensions
  * (GraftExtensions) and, defensively, via
  * `spark.experimental.extraStrategies` at call time so it also works
  * on sessions built without the extension (e.g. the test driver's).
  *
  * Scale: identical shuffle shape to a shuffled join on the key — the
  * planner inserts one hash Exchange per side (none when a child is
  * already co-partitioned, e.g. from a bucketed source) plus the two
  * sorts; per-partition the merge is streaming, so skewed keys cost
  * sort time, not memory.
  */
object AsofJoin {

  /** left.*, plus right.* (nullable) from the matched as-of row.
    * Key/time/tiebreak are COLUMN NAMES, resolved here against each
    * side's analyzed plan (a Column's lazy node would reach the
    * custom operator unresolved — the analyzer only lowers column
    * nodes for nodes it knows). Column names must be disjoint (rename
    * the right side first — aliases mint fresh attribute ids, which
    * also makes self-as-of joins unambiguous). */
  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightTieBreak: Seq[String] = Nil,
      strict: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"rename right-side columns first (duplicates: $dup)")
    val lp = ColumnBridge.analyzed(left)
    val rp = ColumnBridge.analyzed(right)
    def attr(plan: LogicalPlan, name: String): Expression =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val (lk, rk) = (attr(lp, leftKey), attr(rp, rightKey))
    val (lt, rt) = (attr(lp, leftTime), attr(rp, rightTime))
    // the exec compares right values with orderings derived from the
    // LEFT types — mismatched sides would ClassCastException (or worse,
    // compare garbage) at executor runtime; fail at plan build instead
    require(lk.dataType == rk.dataType,
      s"as-of key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"as-of time types differ: ${lt.dataType} vs ${rt.dataType}")
    ColumnBridge.ofRows(spark, AsofJoinPlan(lp, rp,
      lk, rk, lt, rt, rightTieBreak.map(attr(rp, _)), strict))
  }

  /** Idempotent runtime registration (sessions built with
    * GraftExtensions already have it injected). */
  def ensureStrategy(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofJoinStrategy
  }
}

/** Logical node: declarative as-of semantics, resolved attributes in,
  * planner decides the physical realization. */
case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression], strict: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt, tb, strict) =>
      AsofJoinExec(lk, rk, lt, rt, tb, strict, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: co-partitioned (ClusteredDistribution on each
  * side's key) and sorted ((key, time) left; (key, time, tiebreak)
  * right), then a single forward merge per partition.
  *
  * The right cursor only ever advances: for the current left key it
  * swallows every right row at-or-before the left time, remembering
  * the last one seen (`candidate`, O(1) state — later rows win ties
  * because the sort put them later). Left rows of one key arrive
  * time-ascending, so the candidate stays valid and only improves.
  */
case class AsofJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Seq[Expression], strict: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTime, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTime, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.size
    val strictLocal = strict
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      new Iterator[InternalRow] {
        // lookahead right row (owned by rIt — never retained across
        // next() calls without copy)
        private var rNext: InternalRow = advanceRight()
        // the best backward match so far for candidateKey (a private
        // copy, with its key re-evaluated on the copy so the value
        // does not alias the iterator's reused buffer)
        private var candidate: InternalRow = _
        private var candidateKey: Any = _
        private def advanceRight(): InternalRow =
          if (rIt.hasNext) rIt.next() else null
        override def hasNext: Boolean = lIt.hasNext
        override def next(): InternalRow = {
          val l = lIt.next()
          val k = lk.eval(l)
          val t = lt.eval(l)
          if (k == null || t == null) {
            proj(joined(l, nullRight))
          } else {
            if (candidate != null && keyOrd.compare(candidateKey, k) != 0) {
              candidate = null
              candidateKey = null
            }
            var done = false
            while (!done && rNext != null) {
              val rkv = rk.eval(rNext)
              if (rkv == null) rNext = advanceRight()
              else {
                val c = keyOrd.compare(rkv, k)
                if (c < 0) rNext = advanceRight()
                else if (c > 0) done = true
                else {
                  val rtv = rt.eval(rNext)
                  if (rtv == null) rNext = advanceRight()
                  else {
                    val tc = timeOrd.compare(rtv, t)
                    if (if (strictLocal) tc < 0 else tc <= 0) {
                      candidate = rNext.copy()
                      candidateKey = rk.eval(candidate)
                      rNext = advanceRight()
                    } else done = true // right times ascend within key
                  }
                }
              }
            }
            proj(joined(l, if (candidate != null) candidate else nullRight))
          }
        }
      }
    }
  }
}
