package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.{GraftColumnBridge => Bridge}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling hash over a string column:
  * `acc_i = (acc_{i-1} * base + byte_i) mod modulus`, left to right.
  *
  * The composable form — `aggregate(transform(sequence(1, length(s)),
  * i -> ascii(substr(s, i, 1))), 0L, ...)` — materializes a per-character
  * array and runs interpreted (higher-order functions are
  * CodegenFallback), i.e. O(n) allocations per row. This expression walks
  * the UTF8String bytes in a generated loop: zero allocation, whole-stage
  * codegen.
  *
  * NOTE: operates on BYTES; identical to the ascii()-per-char form only
  * for ASCII input. graft's fingerprint pipeline always applies it AFTER
  * [[graft.text.TextFunctions.normalizeForFingerprint]], whose output is
  * [a-z0-9 ]-only, so the two forms agree (and agree with any engine
  * hashing ASCII code points).
  */
case class RollingHash(child: Expression, base: Long, modulus: Long) extends UnaryExpression {

  require(base > 0 && modulus > 1, "base and modulus must be positive")
  require(modulus <= Int.MaxValue, "modulus must stay below 2^31 so acc*base + byte cannot overflow a long")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * base + (bytes(i) & 0xff)) % modulus
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      // CodegenContext.addNewFunction dedups by NAME: two RollingHash
      // instances with different (base, modulus) in one generated class
      // would silently share one body under a fixed name. freshName gives
      // each instance its own method.
      val fnName = ctx.freshName("graftRollingHash")
      val method = ctx.addNewFunction(fnName,
        s"""
           |private long $fnName(org.apache.spark.unsafe.types.UTF8String s) {
           |  byte[] $bytes = s.getBytes();
           |  long $acc = 0L;
           |  for (int $i = 0; $i < $bytes.length; $i++) {
           |    $acc = ($acc * ${base}L + ($bytes[$i] & 0xff)) % ${modulus}L;
           |  }
           |  return $acc;
           |}
         """.stripMargin)
      s"$method($c)"
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val DefaultBase = 31L
  val DefaultModulus = 1000000007L

  def rollingHash(c: Column, base: Long = DefaultBase, modulus: Long = DefaultModulus): Column =
    Bridge.column(RollingHash(Bridge.expression(c), base, modulus))
}
