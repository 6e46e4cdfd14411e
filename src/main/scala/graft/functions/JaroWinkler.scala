package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity — the record-linkage scorer levenshtein
  * under-serves (it over-penalizes transpositions, the dominant human
  * typo). Spark ships levenshtein and soundex but no Jaro-Winkler; this
  * is the standard definition (match window ⌊max/2⌋−1, half-counted
  * transpositions, +0.1/char prefix boost up to 4 chars, boost only when
  * jaro > 0.7), pinned to the same convention DuckDB's
  * `jaro_winkler_similarity` implements — including the nonstandard
  * 0.0 (not 1.0) when either side is empty — so results oracle-verify
  * bit-close across engines (r6-rounded in queries).
  *
  * Codegen emits a static call on the raw UTF8Strings: no boxing, no
  * interpreted fallback, whole-stage codegen stays fused. O(l1·l2)
  * worst-case per pair — meant for CANDIDATE pairs out of a blocked
  * pipeline ([[graft.operators.FuzzyJoin]]), never a cross join.
  *
  * Operates on UTF-16 code units (== code points for ASCII/BMP text;
  * the fuzzy pipeline normalizes before scoring).
  */
case class JaroWinkler(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires two string inputs")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroWinkler {

  /** Static entry shared by interpreted eval and generated code. */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)

    val aFlags = new Array[Boolean](l1)
    val bFlags = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bFlags(j) && a.charAt(i) == b.charAt(j)) {
          aFlags(i) = true; bFlags(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0

    // transpositions: matched chars of a vs matched chars of b, in order
    var k = 0
    var t2 = 0 // full transposition count (halved in the formula)
    i = 0
    while (i < l1) {
      if (aFlags(i)) {
        while (!bFlags(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t2 += 1
        k += 1
      }
      i += 1
    }

    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t2 / 2.0) / md) / 3.0
    if (jaro <= 0.7) return jaro

    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  import org.apache.spark.sql.{GraftColumnBridge => Bridge}

  /** Column API: `jaroWinkler(a, b)` in [0, 1]. */
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
}
