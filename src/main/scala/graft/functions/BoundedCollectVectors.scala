package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.{GraftColumnBridge => Bridge}
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** [[BoundedCollectLongs]] for id+vector payloads: collect up to `max`
  * (id, float-vector) pairs per group, NULL (poisoned, O(1) memory) past
  * the cap. Lets vector near-dup candidate generation use the same
  * single-pass bounded bucket shape as the id-only dedup pipelines — the
  * alternative cell self-join evaluates the upstream corpus twice and
  * has no defense against a degenerate cell.
  *
  * Output: `array<struct<id:bigint, vec:array<float>>>` sorted by id
  * ascending (pair emitters get `id_a < id_b` for free). Buffer memory
  * per group ≤ max × dim × 4 bytes — size the cap accordingly.
  */
case class BoundedCollectVectors(
    id: Expression,
    vec: Expression,
    max: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[BoundedCollectVectors.Buffer] {

  require(max > 0, "max must be positive")

  override def children: Seq[Expression] = Seq(id, vec)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType),
      StructField("vec", ArrayType(FloatType, containsNull = false)))),
    containsNull = false)
  override def prettyName: String = "graft_bounded_collect_vectors"

  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a BIGINT id, got ${id.dataType.sql}")
    else if (!vec.dataType.isInstanceOf[ArrayType] ||
      vec.dataType.asInstanceOf[ArrayType].elementType != FloatType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float> vec, got ${vec.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): BoundedCollectVectors.Buffer =
    new BoundedCollectVectors.Buffer

  override def update(buf: BoundedCollectVectors.Buffer, input: InternalRow): BoundedCollectVectors.Buffer = {
    if (!buf.overflowed) {
      val i = id.eval(input)
      val v = vec.eval(input)
      if (i != null && v != null) {
        buf.values += ((i.asInstanceOf[Long], v.asInstanceOf[ArrayData].toFloatArray()))
        if (buf.values.length > max) buf.poison()
      }
    }
    buf
  }

  override def merge(buf: BoundedCollectVectors.Buffer, other: BoundedCollectVectors.Buffer): BoundedCollectVectors.Buffer = {
    if (buf.overflowed || other.overflowed) buf.poison()
    else {
      buf.values ++= other.values
      if (buf.values.length > max) buf.poison()
    }
    buf
  }

  override def eval(buf: BoundedCollectVectors.Buffer): Any =
    if (buf.overflowed) null
    else new GenericArrayData(
      buf.values.sortBy(_._1).map { case (i, v) =>
        InternalRow(i, new GenericArrayData(v))
      }.toArray)

  override def serialize(buf: BoundedCollectVectors.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.overflowed)
    out.writeInt(buf.values.length)
    buf.values.foreach { case (i, v) =>
      out.writeLong(i)
      out.writeInt(v.length)
      v.foreach(out.writeFloat)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectVectors.Buffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new BoundedCollectVectors.Buffer
    if (in.readBoolean()) buf.poison()
    else {
      val n = in.readInt()
      var j = 0
      while (j < n) {
        val i = in.readLong()
        val v = Array.fill(in.readInt())(in.readFloat())
        buf.values += ((i, v))
        j += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectVectors =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectVectors =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): AggregateFunction =
    copy(id = newChildren(0), vec = newChildren(1))
}

object BoundedCollectVectors {

  final class Buffer {
    var overflowed: Boolean = false
    val values: mutable.ArrayBuffer[(Long, Array[Float])] = mutable.ArrayBuffer.empty
    def poison(): Unit = { overflowed = true; values.clear() }
  }

  /** Column-API entry point; id cast to long, vec to array<float>. */
  def boundedCollectVectors(id: Column, vec: Column, max: Int): Column =
    Bridge.column(
      BoundedCollectVectors(
        Bridge.expression(id.cast("long")),
        Bridge.expression(vec.cast("array<float>")),
        max
      ).toAggregateExpression())
}
