package graft.expressions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String-keyed sibling of [[TopKByScore]]: bounded top-k of
  * (score double, id string) pairs with the identical map-side-first
  * contract — each partition reduces to ≤ k candidates before the
  * shuffle, so per-group shuffle volume is partitions × k however
  * large the keyed domain is (tokens of a web corpus, doc ids).
  *
  * Tie order matches `row_number() OVER (ORDER BY score DESC, id)`
  * EXACTLY: ids compare as [[UTF8String]] (UTF-8 byte order — Spark's
  * string sort order), not as Java Strings (UTF-16 code-unit order,
  * which disagrees beyond the BMP).
  *
  * Output: array<struct<score double, id string>> sorted score desc,
  * id asc.
  */
case class TopKByScoreStr(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKStrBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "top_k_by_score_str"

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, string), got " +
          s"${s.simpleString}/${i.simpleString}")
    }

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    // clone: eval may hand back a buffer-backed UTF8String that the
    // scan reuses for the next row
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: TopKStrBuffer, other: TopKStrBuffer): TopKStrBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKStrBuffer): Any =
    new GenericArrayData(buf.sortedDesc.map { case (s, i) =>
      InternalRow(s, i)
    })

  override def serialize(buf: TopKStrBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val items = buf.items
    out.writeInt(items.length)
    items.foreach { case (s, i) =>
      out.writeDouble(s)
      val b = i.getBytes
      out.writeInt(b.length)
      out.write(b)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKStrBuffer(k)
    var j = 0
    while (j < n) {
      val s = in.readDouble()
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf.offer(s, UTF8String.fromBytes(b))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScoreStr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScoreStr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreStr =
    copy(score = newChildren(0), id = newChildren(1))
}

/** Bounded min-heap of (score, UTF8String id): evicts the worst —
  * lowest score, ties by byte-order-larger id — mirroring
  * [[TopKBuffer]]'s NaN-first double semantics.
  */
final class TopKStrBuffer(k: Int) {
  private val heap = new java.util.PriorityQueue[(Double, UTF8String)](
    k, (a: (Double, UTF8String), b: (Double, UTF8String)) => {
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c else b._2.compareTo(a._2)
    })

  def offer(score: Double, id: UTF8String): Unit = {
    if (heap.size < k) { heap.offer((score, id)); () }
    else {
      val worst = heap.peek()
      val c = java.lang.Double.compare(score, worst._1)
      val better = c > 0 || (c == 0 && id.compareTo(worst._2) < 0)
      if (better) { heap.poll(); heap.offer((score, id)); () }
    }
  }

  def mergeFrom(other: TopKStrBuffer): Unit =
    other.items.foreach { case (s, i) => offer(s, i) }

  def items: Array[(Double, UTF8String)] =
    heap.toArray(Array.empty[(Double, UTF8String)])

  /** (score desc, id asc byte order) — the emission order. */
  def sortedDesc: Array[(Double, UTF8String)] =
    items.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      if (c != 0) c > 0 else a._2.compareTo(b._2) < 0
    }
}
