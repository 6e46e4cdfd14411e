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

/** Element-wise sum of `array<double>` vectors — the centroid-accumulation
  * aggregate for distributed k-means.
  *
  * Why not `posexplode` + per-dimension groupBy: that multiplies the
  * shuffle by the vector dimension (64× for 64-dim embeddings). As a
  * TypedImperativeAggregate this partial-aggregates map-side: each input
  * partition reduces to ONE dim-length buffer per group before the
  * exchange, so the shuffle carries (groups × partitions) vectors total,
  * independent of row count.
  *
  * Null rows are skipped; all non-null inputs must share one dimension
  * (enforced at runtime — a dimension mismatch is data corruption, not a
  * case to silently fold over).
  */
case class VectorSum(
    vec: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vector_sum"

  override def checkInputDataTypes(): TypeCheckResult = vec.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>, got ${other.sql}")
  }

  // empty array = "no input seen yet" (a real vector always has dim >= 1)
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def addInto(buf: Array[Double], v: Array[Double]): Array[Double] =
    if (buf.isEmpty) v.clone()
    else {
      require(buf.length == v.length,
        s"$prettyName: dimension mismatch (${buf.length} vs ${v.length})")
      var i = 0
      while (i < buf.length) { buf(i) += v(i); i += 1 }
      buf
    }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = vec.eval(input)
    if (v == null) buf else addInto(buf, v.asInstanceOf[ArrayData].toDoubleArray())
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] =
    if (other.isEmpty) buf else addInto(buf, other)

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    Array.fill(in.readInt())(in.readDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): AggregateFunction =
    copy(vec = newChildren(0))
}

object VectorSum {

  /** `vectorSum(vec)` aggregate column; float arrays are cast to double. */
  def vectorSum(vec: Column): Column =
    Bridge.column(
      VectorSum(Bridge.expression(vec.cast("array<double>"))).toAggregateExpression())
}
