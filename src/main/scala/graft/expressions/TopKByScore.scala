package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k highest-scoring (score, id)
  * pairs, ties broken by smaller id — exactly the order
  * `row_number() OVER (ORDER BY score DESC, id)` produces, but as a
  * `TypedImperativeAggregate`, so Spark runs it MAP-SIDE first: each
  * input partition reduces to ≤ k candidates before the shuffle.
  *
  * This is the 100 TB shape for per-query top-k: the window-function
  * formulation shuffles every scored row to the query's reducer
  * (shuffle volume = |corpus| × |queries|); this aggregate shuffles
  * ≤ partitions × k rows per query.
  *
  * Output: array<struct<score double, id bigint>> sorted score desc,
  * id asc.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got " +
          s"${s.simpleString}/${i.simpleString}")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buf.items
    out.writeInt(items.length)
    items.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.offer(in.readDouble(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

/** Bounded min-heap of (score, id): evicts the WORST element — lowest
  * score, ties by larger id — so the kept set matches the first k rows
  * of (score DESC, id ASC) ordering deterministically.
  */
final class TopKBuffer(k: Int) {
  // ordering where the head is the worst kept element
  private val heap = new java.util.PriorityQueue[(Double, Long)](
    k, (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    })

  def offer(score: Double, id: Long): Unit = {
    if (heap.size < k) { heap.offer((score, id)); () }
    else {
      val worst = heap.peek()
      // Double.compare, not primitive > : NaN must order ABOVE every
      // value (Spark's DESC sort puts NaN first), or NaN-scored rows
      // would be silently dropped here but ranked first by the window
      // formulation this aggregate claims to match
      val c = java.lang.Double.compare(score, worst._1)
      val better = c > 0 || (c == 0 && id < worst._2)
      if (better) { heap.poll(); heap.offer((score, id)); () }
    }
  }

  def mergeFrom(other: TopKBuffer): Unit =
    other.items.foreach { case (s, i) => offer(s, i) }

  def items: Array[(Double, Long)] =
    heap.toArray(Array.empty[(Double, Long)])

  /** (score desc, id asc) — the emission order; NaN sorts first, like
    * Spark's DESC ordering.
    */
  def sortedDesc: Array[(Double, Long)] =
    items.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c > 0 else a._2 < b._2
    }
}
