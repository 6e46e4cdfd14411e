package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric array columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is
  * correct but runs interpreted: higher-order functions are CodegenFallback
  * and allocate a lambda frame per element. This expression generates a
  * tight primitive loop inside whole-stage codegen instead, which matters
  * because the dot product sits in the innermost loop of ANN search
  * (corpus × queries evaluations).
  *
  * Semantics match the composable form exactly: strict left-to-right
  * double accumulation (bit-deterministic, same result in any engine that
  * folds in order), null if the arrays differ in length or any element is
  * null.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(et, _) => et == FloatType || et == DoubleType
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def getter(et: DataType): (ArrayData, Int) => Double = et match {
    case FloatType  => (a, i) => a.getFloat(i).toDouble
    case DoubleType => (a, i) => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    val ga = getter(elemType(left))
    val gb = getter(elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += ga(a, i) * gb(b, i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val va = CodeGenerator.getValue(a, elemType(left), i)
      val vb = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $va) * ((double) $vb);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  /** Column-API entry point for [[DotProduct]] — usable on any session, no
    * registration required.
    */
  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column-API entry point for [[SqDist]]. */
  def sqDist(a: Column, b: Column): Column =
    ExpressionUtils.column(SqDist(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** SQL-side registration: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or `.withExtensions(new GraftExtensions)`) exposes the native graft
  * expressions to SQL users: `graft_dot(a, b)`,
  * `graft_rolling_hash(s[, base, mod])`, and the aggregates
  * `graft_top_k(score, id, k)` / `graft_vector_sum(vec)` /
  * `graft_frequent_items(item, k)` (the analyzer
  * wraps raw AggregateFunctions in AggregateExpressions on resolution,
  * same as the built-in registry's builders).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def foldedLong(e: Expression, what: String): Long = e match {
    case f if f.foldable && f.eval() != null => f.eval().toString.toLong
    case other =>
      throw new IllegalArgumentException(s"$what must be a literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_sqdist"),
      new ExpressionInfo(classOf[SqDist].getName, "graft_sqdist"),
      (children: Seq[Expression]) => SqDist(children.head, children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (children: Seq[Expression]) =>
        ShingleHashes(children.head, foldedLong(children(1), "n").toInt)
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (children: Seq[Expression]) =>
        children match {
          case Seq(s)          => RollingHash(s, RollingHash.DefaultBase, RollingHash.DefaultModulus)
          case Seq(s, b, m)    => RollingHash(s, foldedLong(b, "base"), foldedLong(m, "modulus"))
          case other           => throw new IllegalArgumentException(
            s"graft_rolling_hash takes 1 or 3 arguments, got ${other.size}")
        }
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(classOf[TopKByScore].getName, "graft_top_k"),
      (children: Seq[Expression]) =>
        TopKByScore(children.head, children(1), foldedLong(children(2), "k").toInt)
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_vector_sum"),
      new ExpressionInfo(classOf[VectorSum].getName, "graft_vector_sum"),
      (children: Seq[Expression]) => VectorSum(children.head)
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_frequent_items"),
      new ExpressionInfo(classOf[FrequentItems].getName, "graft_frequent_items"),
      (children: Seq[Expression]) =>
        FrequentItems(children.head, foldedLong(children(1), "k").toInt)
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => JaroWinkler(children.head, children(1))
    ))
    ext.injectFunction((
      FunctionIdentifier("graft_unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "graft_unicode_normalize"),
      (children: Seq[Expression]) =>
        children match {
          case Seq(s) => UnicodeNormalize(s, "NFC", caseFold = false)
          case Seq(s, f) =>
            UnicodeNormalize(s, foldedString(f, "form"), caseFold = false)
          case Seq(s, f, cf) =>
            UnicodeNormalize(s, foldedString(f, "form"),
              foldedString(cf, "caseFold").toBoolean)
          case other => throw new IllegalArgumentException(
            s"graft_unicode_normalize takes 1-3 arguments, got ${other.size}")
        }
    ))
  }

  private def foldedString(e: Expression, what: String): String = e match {
    case f if f.foldable && f.eval() != null => f.eval().toString
    case other =>
      throw new IllegalArgumentException(s"$what must be a literal, got $other")
  }
}
