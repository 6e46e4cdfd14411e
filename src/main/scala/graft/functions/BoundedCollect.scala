package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.{GraftColumnBridge => Bridge}
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Collect up to `max` long values per group; a group that exceeds the cap
  * evaluates to NULL (and stops buffering immediately).
  *
  * Built for candidate generation in near-dup pipelines: per-shingle /
  * per-LSH-bucket doc-id lists where a "hot" key (a boilerplate shingle
  * appearing in millions of documents) must not (a) blow up executor
  * memory collecting its ids, or (b) survive to emit O(df²) candidate
  * pairs. A plain `collect_list` + post-filter does (a) before the filter
  * can apply; this aggregate's buffer is hard-bounded at `max` entries —
  * once exceeded, the buffer is dropped and the group is poisoned to NULL
  * through every later update/merge.
  *
  * Output: `array<bigint>` SORTED ascending (deterministic under any
  * partitioning; callers emitting ordered pairs get `id_a < id_b` for
  * free), or NULL for over-cap groups.
  */
case class BoundedCollectLongs(
    child: Expression,
    max: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BoundedCollectLongs.Buffer] {

  require(max > 0, "max must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bounded_collect"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a BIGINT child, got ${child.dataType.sql}")

  override def createAggregationBuffer(): BoundedCollectLongs.Buffer =
    new BoundedCollectLongs.Buffer

  override def update(buf: BoundedCollectLongs.Buffer, input: InternalRow): BoundedCollectLongs.Buffer = {
    if (!buf.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        if (buf.n >= max) buf.poison()
        else buf.add(v.asInstanceOf[Long])
      }
    }
    buf
  }

  override def merge(buf: BoundedCollectLongs.Buffer, other: BoundedCollectLongs.Buffer): BoundedCollectLongs.Buffer = {
    if (buf.overflowed || other.overflowed) buf.poison()
    else if (buf.n + other.n > max) buf.poison()
    else {
      var j = 0
      while (j < other.n) { buf.add(other.values(j)); j += 1 }
    }
    buf
  }

  override def eval(buf: BoundedCollectLongs.Buffer): Any =
    if (buf.overflowed) null
    else {
      val out = java.util.Arrays.copyOf(buf.values, buf.n)
      java.util.Arrays.sort(out)
      new GenericArrayData(out)
    }

  override def serialize(buf: BoundedCollectLongs.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.overflowed)
    out.writeInt(buf.n)
    var j = 0
    while (j < buf.n) { out.writeLong(buf.values(j)); j += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectLongs.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BoundedCollectLongs.Buffer
    if (in.readBoolean()) buf.poison()
    else {
      val n = in.readInt()
      var j = 0
      while (j < n) { buf.add(in.readLong()); j += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectLongs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectLongs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): AggregateFunction =
    copy(child = newChildren(0))
}

object BoundedCollectLongs {

  /** Overflow drops the data immediately — a poisoned group costs O(1)
    * memory from that point on, not O(df). PRIMITIVE backing array: the
    * old `ArrayBuffer[Long]` boxed every element, and with tens of
    * millions of shingle/band groups per task the boxes were a measured
    * slice of the dedup family's GC bill (round 13 batch 7).
    */
  final class Buffer {
    var overflowed: Boolean = false
    var values: Array[Long] = new Array[Long](4)
    var n: Int = 0
    def add(v: Long): Unit = {
      if (n == values.length)
        values = java.util.Arrays.copyOf(values, values.length << 1)
      values(n) = v
      n += 1
    }
    def poison(): Unit = { overflowed = true; values = Buffer.Empty; n = 0 }
  }

  private object Buffer { val Empty: Array[Long] = Array.emptyLongArray }

  /** Column-API entry point; the child is cast to long. */
  def boundedCollect(c: Column, max: Int): Column =
    Bridge.column(
      BoundedCollectLongs(Bridge.expression(c.cast("long")), max).toAggregateExpression())
}
