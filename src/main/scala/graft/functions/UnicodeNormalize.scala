package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.{GraftColumnBridge => Bridge}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode normalization (NFC / NFD / NFKC / NFKD, optional
  * case-fold) — the canonicalization step in front of every text dedup
  * / fingerprint pipeline: "ﬁle" (U+FB01) and "file", or "é" composed
  * vs decomposed, must hash identically before near-dup detection can
  * see them as equal. Spark ships no normalizer; this is the
  * custom-Expression tier of the extension ladder (compose > expression
  * > plan), with codegen so it rides inside whole-stage codegen rather
  * than falling back to an interpreted UDF.
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and
  * true for almost all real text (ASCII is always normalized); the
  * allocating `normalize` call runs only on the rare composed/compat
  * rows. Case-folding uses `String.toLowerCase(Locale.ROOT)` —
  * locale-pinned, so cluster JVMs with different default locales agree
  * (the Turkish-İ trap).
  */
case class UnicodeNormalize(child: Expression, form: String, caseFold: Boolean)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"form must be one of ${UnicodeNormalize.Forms.keys.mkString(", ")}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], form, caseFold)

  // NB: the helper must NOT be named `apply` — the case class inherits
  // TreeNode.apply(Int), which suppresses the companion's static
  // forwarder, and the generated Java then fails to compile and the
  // whole stage silently falls back to interpreted execution.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""graft.functions.UnicodeNormalize.normalize($c, "$form", $caseFold)""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {

  val Forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC,
    "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC,
    "NFKD" -> Normalizer.Form.NFKD)

  /** Shared by interpreted eval and generated code. */
  def normalize(s: UTF8String, form: String, caseFold: Boolean): UTF8String = {
    val f = Forms(form)
    val str = s.toString
    val normalized =
      if (Normalizer.isNormalized(str, f)) str else Normalizer.normalize(str, f)
    val folded =
      if (caseFold) normalized.toLowerCase(java.util.Locale.ROOT) else normalized
    if (folded eq str) s else UTF8String.fromString(folded)
  }

  def unicodeNormalize(c: Column, form: String = "NFC", caseFold: Boolean = false): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(c), form, caseFold))
}
