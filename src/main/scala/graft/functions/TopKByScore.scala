package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.{GraftColumnBridge => Bridge}
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Bounded top-k aggregate: keeps the k best (score, id) pairs, ordered by
  * score DESC with id ASC tie-break.
  *
  * Why not `row_number() over (partition by query)`: a window must shuffle
  * EVERY scored row to its query's partition before ranking — at corpus
  * scale that is the entire corpus×queries score set. This aggregate is a
  * TypedImperativeAggregate, so Spark runs it map-side first: each input
  * partition reduces to ≤ k pairs per group before the exchange, and the
  * shuffle carries k rows per (partition × group) instead of the full
  * score set. Same algebraic shape as the reference's per-shard
  * map + cross-shard reduce.
  *
  * Output: `array<struct<score:double, id:bigint>>`, best first,
  * deterministic under ties (id ascending).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // head of the queue = WORST kept element (smallest score, then largest id)
  // so eviction is O(log k).
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false

  // update() evals children as Double/Long directly; anything else would
  // ClassCastException (or corrupt results) at EXECUTION time, so reject it
  // at analysis time. The Column builder below inserts the casts for
  // callers with float scores / int ids.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType != DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a DOUBLE score, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT id, got ${id.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  private def insert(buf: mutable.PriorityQueue[(Double, Long)], s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      if (s > ws || (s == ws && i < wi)) { buf.dequeue(); buf.enqueue((s, i)) }
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (s, i) => insert(buf, s, i) }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): AggregateFunction =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {

  /** Column-API entry point: `topK(score, id, k)` as an aggregate column.
    * Casts are inserted here so float scores / int ids satisfy the
    * expression's strict type check.
    */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score.cast("double")), Bridge.expression(id.cast("long")), k)
        .toAggregateExpression())
}
