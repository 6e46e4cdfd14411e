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
import scala.collection.mutable

/** KMV (k-minimum-values) distinct sketch aggregate: keeps the k smallest
  * DISTINCT hash values per group.
  *
  * The mergeable distinct-count sketch whose sketches also support SET
  * ALGEBRA: two groups' sketches combine row-locally into union /
  * intersection / Jaccard ESTIMATES (Beyer et al. 2007) — which HLL
  * cannot do (no intersection), and which an exact pairwise
  * `count(DISTINCT)` join would pay a full shuffle per group PAIR for.
  *
  * Like [[TopKByScore]] this is a TypedImperativeAggregate so Spark runs
  * it map-side: each partition reduces to ≤ k values per group before
  * the exchange — the shuffle carries k longs per (partition × group)
  * regardless of corpus size. Unlike TopKByScore the buffer DEDUPES
  * (a TreeSet): the same value observed twice must occupy one slot, or
  * the kth-minimum statistic (and every estimate built on it) is biased
  * by multiplicity.
  *
  * Output: `array<bigint>` of the ≤ k smallest distinct values, ascending
  * (deterministic under any partitioning). A group with < k distinct
  * values returns ALL of them — the sketch degrades to the exact set.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a BIGINT child, got ${child.dataType.sql}")

  override def createAggregationBuffer(): mutable.TreeSet[Long] = mutable.TreeSet.empty[Long]

  private def insert(buf: mutable.TreeSet[Long], v: Long): Unit =
    if (buf.size < k) buf += v
    else if (v < buf.last && !buf.contains(v)) { buf -= buf.last; buf += v }

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: mutable.TreeSet[Long], other: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { buf += in.readLong(); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): AggregateFunction =
    copy(child = newChildren(0))
}

object KmvSketch {

  /** Column-API entry point: `kmv(hash, k)` as an aggregate column. */
  def kmv(hash: Column, k: Int): Column =
    Bridge.column(KmvSketch(Bridge.expression(hash.cast("long")), k).toAggregateExpression())
}
