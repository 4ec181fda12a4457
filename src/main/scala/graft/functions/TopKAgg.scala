package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score desc, id asc)
  * pairs in a per-group heap.
  *
  * The usual row_number-over-window top-k sorts *every* row of every
  * group; at 100 TB that is a full shuffle-sort of the scored table.
  * This TypedImperativeAggregate keeps O(k) state per group, combines
  * map-side (partial aggregation), and never sorts more than k elements
  * per partition — the same contract as Spark's own collect_top_k
  * internal operator, exposed as a reusable function.
  *
  * Returns array<struct<score double, id bigint>> sorted best-first.
  */
case class TopKAgg(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Buffer] with ExpectsInputTypes {

  require(k > 0, "top-k needs k > 0")

  // declared types turn top_k(int_score, ...) into an analysis error
  // (update would otherwise ClassCastException on every task)
  override def inputTypes = Seq(DoubleType, LongType)
  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKAgg.entryType, containsNull = false)
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): TopKAgg.Buffer = new TopKAgg.Buffer(k)

  override def update(buf: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKAgg.Buffer, other: TopKAgg.Buffer): TopKAgg.Buffer = {
    other.foreach(buf.add)
    buf
  }

  override def eval(buf: TopKAgg.Buffer): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKAgg.Buffer): Array[Byte] = {
    val entries = buf.sortedBestFirst
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKAgg.Buffer(k)
    (0 until n).foreach { _ => buf.add(bb.getDouble, bb.getLong) }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  val entryType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** "best" = higher score, then lower id. The heap keeps the current
    * worst of the kept k on top for O(log k) eviction. */
  // rank key (-score, id): smaller = better; PriorityQueue dequeues the
  // max, i.e. the worst kept entry — exactly what eviction needs
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  final class Buffer(k: Int) {
    private val heap = scala.collection.mutable.PriorityQueue.empty(worstFirst)

    def add(s: Double, i: Long): Unit = add((s, i))
    def add(e: (Double, Long)): Unit = {
      if (heap.size < k) heap.enqueue(e)
      else if (worstFirst.lt(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
    }
    def foreach(f: ((Double, Long)) => Unit): Unit = heap.foreach(f)
    def sortedBestFirst: Array[(Double, Long)] =
      heap.toArray.sortBy { case (s, i) => (-s, i) }
  }
}

object TopK {
  /** Column API: top_k(score, id, k) — array of the k best
    * (score desc, id asc) entries per group. */
  def top_k(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
