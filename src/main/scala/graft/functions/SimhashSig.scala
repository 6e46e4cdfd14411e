package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{GraftColumnBridge => Bridge}
import org.apache.spark.sql.types._

/** Native simhash signature from a per-row array of 32-bit feature
  * hashes: per bit b, a +1/-1 vote per array element (occurrence-
  * weighted — duplicates vote multiply, matching the exploded groupBy
  * formulation), bit set iff the vote total is positive.
  *
  * Composes with [[ShingleHashes]] (n = 1 hashes each token exactly as
  * `md5Hash32(token)`) to make the whole signature a row-local
  * projection — the old shape exploded every token occurrence and ran a
  * corpus-wide 32-sum aggregate for identical output (integer votes are
  * order-free, so this is bit-exact, not approximate).
  *
  * NULL array → NULL; empty array → all votes lose, signature 0
  * (callers that exclude token-less docs filter before calling).
  */
case class SimhashSig(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimhashSig.compute(input.asInstanceOf[ArrayData], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashSig.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashSig =
    copy(child = newChild)
}

object SimhashSig {

  def simhashSig(hashes: Column, bits: Int): Column =
    Bridge.column(SimhashSig(Bridge.expression(hashes), bits))

  def compute(hashes: ArrayData, bits: Int): Long = {
    val n = hashes.numElements()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < n) {
      // ShingleHashes emits containsNull=false arrays; guard anyway for
      // SQL-composed inputs
      if (!hashes.isNullAt(i)) {
        val h = hashes.getLong(i)
        var b = 0
        while (b < bits) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
