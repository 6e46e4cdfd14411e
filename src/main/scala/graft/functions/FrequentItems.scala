package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.{GraftColumnBridge => Bridge}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra–Gries frequent-items sketch as a mergeable aggregate: at most
  * `k` (item, weight) counters survive in the buffer, and any item whose
  * true frequency exceeds N/(k+1) is GUARANTEED to be among them
  * (candidate superset — no false negatives; weights are lower bounds
  * with error ≤ N/(k+1)).
  *
  * The point is the same as [[TopKByScore]]: a full `groupBy(item)`
  * shuffles every distinct item; this TypedImperativeAggregate reduces
  * each map partition to ≤ k counters before the exchange, so the
  * shuffle carries k rows per partition no matter how many distinct
  * items exist — the sketch half of the classic two-pass exact heavy
  * hitters ([[graft.operators.HeavyHitters]] does the exact recount).
  *
  * Counter merge (Agarwal et al.'s mergeable-summaries result): add
  * weights for shared items, then if > k counters survive, subtract the
  * (k+1)-st largest weight from all and drop the non-positive — the
  * merged sketch keeps the same error bound. Decrements make the
  * SURVIVOR SET depend on partitioning, which is why the candidates are
  * never an answer by themselves, only a superset to recount.
  *
  * Output: `array<struct<item:string, weight:bigint>>`, weight DESC /
  * item ASC (deterministic given the same buffer contents).
  */
case class FrequentItems(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (item.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING item, got ${item.dataType.sql}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType), StructField("weight", LongType))),
    containsNull = false)
  override def prettyName: String = "graft_frequent_items"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Misra–Gries step: known item increments; new item either takes a
    * free counter or decrements ALL counters (dropping zeros).
    */
  private def offer(buf: mutable.HashMap[String, Long], s: String, w: Long): Unit = {
    buf.get(s) match {
      case Some(c) => buf.update(s, c + w)
      case None if buf.size < k => buf.update(s, w)
      case None =>
        // decrement by the largest amount that frees a counter in one go:
        // min(current minimum, w) per classic MG generalized to weights
        val dec = math.min(buf.valuesIterator.min, w)
        val it = buf.keysIterator.toArray
        var i = 0
        while (i < it.length) {
          val key = it(i)
          val nv = buf(key) - dec
          if (nv <= 0) buf.remove(key) else buf.update(key, nv)
          i += 1
        }
        val rem = w - dec
        if (rem > 0 && buf.size < k) buf.update(s, rem)
    }
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = item.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (s, w) => buf.update(s, buf.getOrElse(s, 0L) + w) }
    if (buf.size > k) {
      // subtract the (k+1)-st largest weight; ≤ k positives survive
      val dec = buf.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
      val keys = buf.keysIterator.toArray
      var i = 0
      while (i < keys.length) {
        val key = keys(i)
        val nv = buf(key) - dec
        if (nv <= 0) buf.remove(key) else buf.update(key, nv)
        i += 1
      }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (s, w) => (-w, s) }
    new GenericArrayData(sorted.map { case (s, w) =>
      InternalRow(UTF8String.fromString(s), w)
    })
  }

  // length-prefixed UTF-8, NOT writeUTF: items are arbitrary strings
  // (lines, URLs, shingles) and writeUTF throws past 65,535 encoded
  // bytes — an opaque task failure exactly when items get interesting
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, w) =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(w)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): AggregateFunction =
    copy(item = newChildren(0))
}

object FrequentItems {

  /** `frequentItems(item, k)` aggregate column: ≤ k (item, weight)
    * candidates containing every item with frequency > N/(k+1).
    */
  def frequentItems(item: Column, k: Int): Column =
    Bridge.column(
      FrequentItems(Bridge.expression(item.cast("string")), k).toAggregateExpression())
}
