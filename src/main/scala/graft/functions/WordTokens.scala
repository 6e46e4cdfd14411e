package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native lowercase word tokenizer — the codegen twin of
  * `filter(split(lower(text), "[^a-z]+"), t => t =!= "")`, the single
  * most-shared text kernel in the library (~80 call sites: token counts,
  * TF-IDF, vocabulary fits, language ID, the curation chain).
  *
  * Equivalence argument: `split` on `[^a-z]+` partitions the lowercased
  * string and the filter drops the empty fields, so the result is
  * exactly the maximal runs of [a-z] — which this expression extracts in
  * one byte scan. Lowercasing goes through the SAME
  * `UTF8String.toLowerCase` the built-in `lower` uses (full Unicode,
  * length may change), and a-z are single-byte UTF-8 values that cannot
  * occur inside a multi-byte sequence (continuation bytes are ≥ 0x80),
  * so the byte scan finds the same runs the code-point regex does. The
  * composable form's regex engine and per-token interpreted filter
  * lambda were the dominant per-row cost of every tokenizing query
  * (guide §4).
  */
case class WordTokens(child: Expression) extends UnaryExpression {

  // split() declares non-null elements and filter() preserves that
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_word_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordTokens.tokenize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = graft.functions.WordTokens.tokenize($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordTokens =
    copy(child = newChild)
}

/** Native set-membership array filter — the codegen twin of
  * `filter(tokens, t => t.isInCollection(words))` for the stopword-hit
  * counters behind language ID and quality features (5 interpreted
  * lambda filters per row in langId alone). Same semantics: NULL array
  * → NULL; NULL elements dropped (a NULL predicate is not true);
  * element order preserved; duplicates kept.
  */
case class FilterInSet(child: Expression, words: Array[String])
    extends UnaryExpression {

  private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_filter_in_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = a.numElements()
    val out = new java.util.ArrayList[UTF8String](math.min(n, 16))
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val t = a.getUTF8String(i)
        if (set.contains(t)) out.add(t)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val expr = ctx.addReferenceObj("filterInSetExpr", this, classOf[FilterInSet].getName)
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $expr.nullSafeEval($a);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FilterInSet =
    copy(child = newChild)
}

/** Native ASCII-set character counter — the codegen twin of
  * `length(regexp_replace(text, "[^<set>]", ""))` (negate = false:
  * count the codepoints IN the set) and of
  * `length(regexp_replace(text, "[<set>]", ""))` (negate = true: count
  * the codepoints NOT in the set). Only valid for sets of ASCII
  * characters: each is one byte = one codepoint, and those bytes cannot
  * occur inside multi-byte UTF-8 sequences, so a byte scan counts
  * exactly the codepoints the regex form keeps. With `lowercase` the
  * input first passes through the SAME `UTF8String.toLowerCase` the
  * built-in `lower` uses. NULL text → NULL (the regex form's
  * propagation).
  */
case class AsciiCharCount(
    child: Expression,
    chars: Array[Byte],
    negate: Boolean,
    lowercase: Boolean) extends UnaryExpression {

  require(chars.forall(b => b >= 0), "AsciiCharCount needs ASCII set members")

  private lazy val inSet: Array[Boolean] = {
    val m = new Array[Boolean](128)
    chars.foreach(b => m(b.toInt) = true)
    m
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ascii_char_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val s0 = input.asInstanceOf[UTF8String]
    val s = if (lowercase) s0.toLowerCase else s0
    val bytes = s.getBytes
    var hit = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0 && inSet(b.toInt)) hit += 1
      i += 1
    }
    if (!negate) hit else s.numChars() - hit
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val expr = ctx.addReferenceObj("asciiCountExpr", this, classOf[AsciiCharCount].getName)
      s"""
         |${ev.value} = ((Integer) $expr.nullSafeEval($s)).intValue();
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AsciiCharCount =
    copy(child = newChild)
}

/** Native token counters — the codegen twins of
  * `size(filter(split(text, "\\s+"), t => t =!= ""))` (bpeish = false:
  * count of maximal non-whitespace runs) and of
  * `size(regexp_extract_all(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]", 0))`
  * (bpeish = true: one count per ASCII-letter run, per ASCII digit, and
  * per other non-whitespace CODEPOINT — the alternation is left-to-right
  * maximal, so those are exactly its matches). Both regex passes reduce
  * to one byte scan: Java's default `\s` is the ASCII set
  * [ \t\n\x0B\f\r], ASCII bytes cannot occur inside multi-byte UTF-8
  * sequences, and non-ASCII codepoints count via their single lead byte
  * ((b & 0xC0) != 0x80). NULL text → NULL.
  */
case class AsciiTokenCount(child: Expression, bpeish: Boolean) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ascii_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bpeish) WordTokens.bpeishCount(bytes) else WordTokens.wsRunCount(bytes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val fn = if (bpeish) "bpeishCount" else "wsRunCount"
      s"""
         |${ev.value} = graft.functions.WordTokens.$fn($s.getBytes());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AsciiTokenCount =
    copy(child = newChild)
}

object WordTokens {

  private def isAsciiWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** Count of maximal runs of non-whitespace bytes (Java ASCII \s). */
  def wsRunCount(bytes: Array[Byte]): Int = {
    var count = 0
    var inRun = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0 && isAsciiWs(b)) inRun = false
      else { if (!inRun) count += 1; inRun = true }
      i += 1
    }
    count
  }

  /** Count of `[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]` matches: letter runs count
    * once, digits and other non-ws codepoints count each (non-ASCII via
    * their lead byte — one per codepoint, like Java's negated class).
    */
  def bpeishCount(bytes: Array[Byte]): Int = {
    var count = 0
    var inLetters = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0) {
        if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) {
          if (!inLetters) count += 1
          inLetters = true
        } else {
          inLetters = false
          if (!isAsciiWs(b)) count += 1 // digit or other ASCII glyph
        }
      } else {
        inLetters = false
        if ((b & 0xc0) != 0x80) count += 1 // lead byte = one codepoint
      }
      i += 1
    }
    count
  }

  /** One-pass run extraction over the lowercased bytes. */
  def tokenize(s: UTF8String): GenericArrayData = {
    val lower = s.toLowerCase
    val bytes = lower.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](16)
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') {
        val start = i
        i += 1
        while (i < n && bytes(i) >= 'a' && bytes(i) <= 'z') i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def wordTokens(text: Column): Column =
    ExpressionUtils.column(WordTokens(ExpressionUtils.expression(text)))

  def filterInSet(tokens: Column, words: Seq[String]): Column =
    ExpressionUtils.column(FilterInSet(ExpressionUtils.expression(tokens), words.toArray))

  def asciiTokenCount(text: Column, bpeish: Boolean): Column =
    ExpressionUtils.column(AsciiTokenCount(ExpressionUtils.expression(text), bpeish))

  /** Count codepoints of `text` in (negate=false) or not in (negate=true)
    * the ASCII `chars` set, optionally lowercasing first.
    */
  def asciiCharCount(
      text: Column, chars: String, negate: Boolean = false,
      lowercase: Boolean = false): Column =
    ExpressionUtils.column(AsciiCharCount(
      ExpressionUtils.expression(text),
      chars.getBytes(java.nio.charset.StandardCharsets.US_ASCII), negate, lowercase))
}
