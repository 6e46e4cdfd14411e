package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Typed analog of the reference's event-configuration expression DSL
  * (reference: src/MEDS_transforms/extract/parser.py).
  *
  * The reference parses YAML fragments into Polars expressions; graft
  * expresses the same grammar as a Scala ADT compiled to Catalyst columns:
  *
  *   - `Col(name)`        — parser.py:106-117 COL: read a column
  *   - `Str(template)`    — parser.py:119-226 STR: f-string-style
  *     interpolation `"bar//{foo}//{baz}"`; any null referenced column
  *     nulls the result (pl.format semantics)
  *   - `Literal(v)`       — parser.py LITERAL: constant of any type
  *   - `FirstValid(opts)` — parser.py:340-430 list form: coalesce over
  *     sub-expressions in order
  *   - `Guarded(matcher, out)` — parser.py:41-102 + 340-430 dict form:
  *     `when(all key==value).then(out).otherwise(null)`; the matcher is a
  *     conjunction of column equalities
  */
object EventParser {

  sealed trait ColExpr
  final case class Col(name: String) extends ColExpr
  final case class Str(template: String) extends ColExpr
  final case class Literal(value: Any) extends ColExpr
  final case class FirstValid(options: Seq[ColExpr]) extends ColExpr
  final case class Guarded(matcher: Map[String, Any], output: ColExpr) extends ColExpr

  /** Conjunction-of-equalities matcher (matcher_to_expr, parser.py:65-102);
    * an empty matcher matches every row.
    */
  def matcherToColumn(matcher: Map[String, Any]): Column =
    matcher.map { case (k, v) => col(k) === lit(v) }.reduceOption(_ && _).getOrElse(lit(true))

  private val Interp = "\\{([^}]+)\\}".r

  /** Compile a [[ColExpr]] to a Catalyst column. */
  def toColumn(e: ColExpr): Column = e match {
    case Col(name)    => col(name)
    case Literal(v)   => lit(v)
    case FirstValid(options) => coalesce(options.map(toColumn): _*)
    case Guarded(matcher, output) => when(matcherToColumn(matcher), toColumn(output))
    case Str(template) =>
      // Alternate literal segments and column refs; concat null-propagates
      // exactly like pl.format.
      val parts = scala.collection.mutable.ArrayBuffer.empty[Column]
      var last = 0
      for (m <- Interp.findAllMatchIn(template)) {
        if (m.start > last) parts += lit(template.substring(last, m.start))
        parts += col(m.group(1)).cast("string")
        last = m.end
      }
      if (last < template.length) parts += lit(template.substring(last))
      if (parts.isEmpty) lit("") else concat(parts.toSeq: _*)
  }

  /** Row filter from a matcher config (the reference's per-event-block
    * row-subsetting, convert_to_sharded_events.py).
    */
  def filterByMatcher(df: org.apache.spark.sql.DataFrame, matcher: Map[String, Any]): org.apache.spark.sql.DataFrame =
    df.filter(matcherToColumn(matcher))
}
