package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All `k` minhash minimums in ONE pass over a shingle-hash array:
  * `out[j] = min over sh of pmod(sh * a_j + b_j, prime)` — the minhash
  * signature kernel as a single codegen'd expression.
  *
  * The composable form (`array(k × array_min(transform(shs, …)))`)
  * evaluates k interpreted lambdas per row — k × positions interpreted
  * `pmod` calls, the dominant cost of every minhash query once the
  * shuffle was removed (measured: a 16-hash signature pass over the 100x
  * corpus spent ~30 s in lambda evaluation alone). This expression makes
  * the same k × positions affine-mod updates inside one JIT-compiled
  * loop.
  *
  * Arithmetic is bit-identical to the composable form: `sh * a + b` in
  * wrapping 64-bit (Spark's non-ANSI Multiply/Add), then Spark's `pmod`
  * (((x % p) + p) % p). Null input array or any null element ⇒ null;
  * empty array ⇒ null (a doc with no shingles has no signature — the
  * `when(size > 0, …)` convention callers relied on).
  */
case class MinhashMins(
    child: Expression,
    as: Array[Long],
    bs: Array[Long],
    prime: Long
) extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty, "need aligned non-empty hash params")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_mins"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val sh = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = ((sh * as(j) + bs(j)) % prime + prime) % prime
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val aRef = ctx.addReferenceObj("as", as, "long[]")
      val bRef = ctx.addReferenceObj("bs", bs, "long[]")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val sh = ctx.freshName("sh")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $k = $aRef.length;
         |  final long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $sh = $a.getLong($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      final long $v = (($sh * $aRef[$j] + $bRef[$j]) % ${prime}L + ${prime}L) % ${prime}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashMins =
    copy(child = newChild)
}

object MinhashMins {

  /** Column-API entry point: array<long> of the k minhash minimums of the
    * shingle-hash array, null when the array is null/empty.
    */
  def minhashMins(shingleHashes: Column, as: Array[Long], bs: Array[Long], prime: Long): Column =
    ExpressionUtils.column(
      MinhashMins(ExpressionUtils.expression(shingleHashes), as, bs, prime))
}
