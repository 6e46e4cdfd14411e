package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native row-local linear-algebra kernels for the bounded-matrix
  * projections the ANN/PCA family applies per corpus row. Each is the
  * codegen twin of a composable HOF form whose interpreted lambda fold
  * was measured as the dominant per-row cost (guide §4: eliminate
  * non-codegen expressions in the hot path) — [[SqDist]] /
  * [[NearestCentroid]] discipline: SAME left-to-right double
  * accumulation, SAME null propagation, so swapping them in cannot move
  * any value by a bit.
  */
object MatOps {

  /** y = x·M as a literal mat-vec: `cols(j)(i)` is output dim j's weight
    * on input dim i, `y_j = Σ_i x_i·cols(j)(i)` accumulated in ascending
    * i (the exact fold order of the composable
    * `transform(sequence, j => aggregate(zip_with(x, M), 0.0, +))`).
    * Null semantics replicated from that form: a NULL vector is NULL; a
    * length mismatch or any NULL element yields an all-NULL y (zip_with
    * pads with NULLs and the running sum absorbs them).
    */
  def matVec(vec: Column, cols: Array[Array[Double]]): Column = {
    require(cols.nonEmpty && cols.forall(_.length == cols(0).length),
      "matVec needs a non-empty rectangular matrix")
    ExpressionUtils.column(MatVec(ExpressionUtils.expression(vec), cols))
  }

  /** Flattened row-local outer product x⊗x (row-major, length |x|²) —
    * the moment kernel of PCA/OPQ. Element (i,j) is NULL iff x_i or x_j
    * is NULL (the composable `flatten(transform(x, xi => transform(x,
    * xj => xi·xj)))` semantics).
    */
  def outerFlat(vec: Column): Column =
    ExpressionUtils.column(OuterFlat(ExpressionUtils.expression(vec)))

  /** PQ code assignment: per block b, the argmin centroid index of
    * x[b·bd, (b+1)·bd) against `centroids(b)`, with the composable
    * fold's conventions — candidates scan in ascending index, strictly
    * smaller distance wins (ties keep the incumbent), a NULL/NaN
    * distance (length mismatch, NULL element) is skipped, and a block
    * with no winner emits −1.
    */
  def pqCodes(vec: Column, centroids: Array[Array[Array[Double]]]): Column = {
    require(centroids.nonEmpty && centroids.forall(_.nonEmpty),
      "pqCodes needs at least one centroid per block")
    val bd = centroids(0)(0).length
    require(centroids.forall(_.forall(_.length == bd)),
      "pqCodes centroids must share one block dim")
    ExpressionUtils.column(PqCodes(ExpressionUtils.expression(vec), centroids))
  }

  /** ADC distance: Σ_b dtable(b)(codes(b)) in ascending-b order — the
    * native twin of the per-candidate
    * `aggregate(zip_with(codes, dtable, (c, t) => element_at(t, c + 1)),
    * 0.0, +)` fold ([[ProductQuantizer.searchADC]] / [[IvfPq]]), which
    * allocated a zipped array and ran interpreted lambda steps per
    * (corpus row × probed query) pair. Same accumulation order; NULL
    * semantics replicated from the fold: NULL inputs, mismatched
    * lengths, or a NULL code/table entry make the running sum NULL. One
    * deliberate divergence class, pinned in MatOpsSpec: an OUT-OF-RANGE
    * code (the [[pqCodes]] −1 no-winner sentinel, or past-the-end)
    * contributes NULL where ANSI `element_at` THROWS — a corpus row
    * without a valid code should drop from ranking, not kill the query;
    * pqCodes output against the model's own tables is always in range.
    */
  def adcLookup(codes: Column, dtable: Column): Column =
    ExpressionUtils.column(
      AdcLookup(ExpressionUtils.expression(codes), ExpressionUtils.expression(dtable)))
}

private[functions] trait ArrayDoubleInput { self: UnaryExpression =>
  protected def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == FloatType || et == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float|double> input, got ${other.catalogString}")
  }
}

case class MatVec(child: Expression, cols: Array[Array[Double]])
    extends UnaryExpression with ArrayDoubleInput {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  // the composable form wraps transform(sequence(...)) — the OUTER array
  // always exists, even for a NULL input vector (its entries are NULL)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_matvec"

  private def rows: Int = cols.length
  private def inner: Int = cols(0).length

  private def allNull: GenericArrayData = new GenericArrayData(new Array[Any](rows))

  override def eval(input: InternalRow): Any = {
    val value = child.eval(input)
    if (value == null) return allNull
    val a = value.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != inner) return allNull
    val v = new Array[Double](n)
    val isFloat = elemType == FloatType
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return allNull
      v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val out = new Array[Double](rows)
    var j = 0
    while (j < rows) {
      val w = cols(j)
      var acc = 0.0
      var k = 0
      while (k < n) { acc += v(k) * w(k); k += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val m = ctx.addReferenceObj("cols", cols, "double[][]")
    val n = ctx.freshName("n")
    val v = ctx.freshName("v")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val k = ctx.freshName("k")
    val w = ctx.freshName("w")
    val acc = ctx.freshName("acc")
    val out = ctx.freshName("out")
    val bad = ctx.freshName("bad")
    val a = childGen.value
    val va = CodeGenerator.getValue(a, elemType, i)
    val code =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |{
         |  boolean $bad = ${childGen.isNull};
         |  if (!$bad) {
         |    final int $n = $a.numElements();
         |    $bad = ($n != $inner);
         |    if (!$bad) {
         |      final double[] $v = new double[$n];
         |      for (int $i = 0; $i < $n; $i++) {
         |        if ($a.isNullAt($i)) { $bad = true; break; }
         |        $v[$i] = (double) $va;
         |      }
         |      if (!$bad) {
         |        final double[] $out = new double[$rows];
         |        for (int $j = 0; $j < $rows; $j++) {
         |          final double[] $w = $m[$j];
         |          double $acc = 0.0;
         |          for (int $k = 0; $k < $n; $k++) { $acc += $v[$k] * $w[$k]; }
         |          $out[$j] = $acc;
         |        }
         |        ${ev.value} =
         |          new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |      }
         |    }
         |  }
         |  if ($bad) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |      new Object[$rows]);
         |  }
         |}
       """.stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)
}

case class OuterFlat(child: Expression)
    extends UnaryExpression with ArrayDoubleInput {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_outer_flat"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isFloat = elemType == FloatType
    val v = new Array[Double](n)
    val nulls = new Array[Boolean](n)
    var hasNull = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) { nulls(i) = true; hasNull = true }
      else v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    if (!hasNull) {
      val out = new Array[Double](n * n)
      var p = 0
      i = 0
      while (i < n) {
        val xi = v(i)
        var j = 0
        while (j < n) { out(p) = xi * v(j); p += 1; j += 1 }
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n * n)
      var p = 0
      i = 0
      while (i < n) {
        var j = 0
        while (j < n) {
          if (!nulls(i) && !nulls(j)) out(p) = java.lang.Double.valueOf(v(i) * v(j))
          p += 1; j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  // The null-element path is the cold edge; interpreted eval through the
  // reference object keeps the generated method tiny.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val expr = ctx.addReferenceObj("outerFlatExpr", this, classOf[OuterFlat].getName)
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  $expr.nullSafeEval($a);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): OuterFlat =
    copy(child = newChild)
}

case class PqCodes(child: Expression, centroids: Array[Array[Array[Double]]])
    extends UnaryExpression with ArrayDoubleInput {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  // the composable form maps over the array(struct(blk, slice(...)))
  // constructor — a NULL input vector still emits numBlocks −1 codes
  override def nullable: Boolean = false
  override def prettyName: String = "graft_pq_codes"

  private def numBlocks: Int = centroids.length
  private def blockDim: Int = centroids(0)(0).length

  override def eval(input: InternalRow): Any = {
    val value = child.eval(input)
    if (value == null) {
      val out = new Array[Any](numBlocks)
      java.util.Arrays.fill(out.asInstanceOf[Array[AnyRef]], Integer.valueOf(-1))
      return new GenericArrayData(out)
    }
    nullSafeEval(value)
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val isFloat = elemType == FloatType
    val out = new Array[Any](numBlocks)
    var b = 0
    while (b < numBlocks) {
      val start = b * blockDim
      var code = -1
      // slice shorter than blockDim (or a NULL element) nulls every
      // candidate distance: the fold keeps its -1 seed
      if (start + blockDim <= n) {
        var ok = true
        val sub = new Array[Double](blockDim)
        var i = 0
        while (i < blockDim && ok) {
          if (a.isNullAt(start + i)) ok = false
          else sub(i) = if (isFloat) a.getFloat(start + i).toDouble
                        else a.getDouble(start + i)
          i += 1
        }
        if (ok) {
          val table = centroids(b)
          var best = Double.MaxValue
          var c = 0
          while (c < table.length) {
            val ct = table(c)
            var acc = 0.0
            var j = 0
            while (j < blockDim) {
              val d = sub(j) - ct(j)
              acc += d * d
              j += 1
            }
            // strict < : ties and NaN keep the incumbent (the composable
            // when(d < acc.d) convention)
            if (acc < best) { best = acc; code = c }
            c += 1
          }
        }
      }
      out(b) = code
      b += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][][]")
    val n = ctx.freshName("n")
    val out = ctx.freshName("out")
    val b = ctx.freshName("b")
    val start = ctx.freshName("start")
    val code0 = ctx.freshName("code")
    val ok = ctx.freshName("ok")
    val sub = ctx.freshName("sub")
    val i = ctx.freshName("i")
    val table = ctx.freshName("table")
    val best = ctx.freshName("best")
    val c = ctx.freshName("c")
    val ct = ctx.freshName("ct")
    val acc = ctx.freshName("acc")
    val j = ctx.freshName("j")
    val d = ctx.freshName("d")
    val idx = ctx.freshName("idx")
    val a = childGen.value
    val va = CodeGenerator.getValue(a, elemType, idx)
    val genCode =
      code"""
         |${childGen.code}
         |final Object[] $out = new Object[$numBlocks];
         |{
         |  final int $n = ${childGen.isNull} ? -1 : $a.numElements();
         |  for (int $b = 0; $b < $numBlocks; $b++) {
         |    final int $start = $b * $blockDim;
         |    int $code0 = -1;
         |    if ($start + $blockDim <= $n) {
         |      boolean $ok = true;
         |      final double[] $sub = new double[$blockDim];
         |      for (int $i = 0; $i < $blockDim && $ok; $i++) {
         |        final int $idx = $start + $i;
         |        if ($a.isNullAt($idx)) { $ok = false; }
         |        else { $sub[$i] = (double) $va; }
         |      }
         |      if ($ok) {
         |        final double[][] $table = $cents[$b];
         |        double $best = Double.MAX_VALUE;
         |        for (int $c = 0; $c < $table.length; $c++) {
         |          final double[] $ct = $table[$c];
         |          double $acc = 0.0;
         |          for (int $j = 0; $j < $blockDim; $j++) {
         |            final double $d = $sub[$j] - $ct[$j];
         |            $acc += $d * $d;
         |          }
         |          if ($acc < $best) { $best = $acc; $code0 = $c; }
         |        }
         |      }
         |    }
         |    $out[$b] = $code0;
         |  }
         |}
         |final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    ev.copy(code = genCode,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

case class AdcLookup(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adc_lookup"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(et, _), _))
        if et == FloatType || et == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<array<float|double>>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
  }

  private def innerIsFloat: Boolean = right.dataType match {
    case ArrayType(ArrayType(FloatType, _), _) => true
    case _ => false
  }

  // BinaryExpression's default eval null-short-circuits both children —
  // exactly the zip_with NULL-input convention.
  override def nullSafeEval(codesAny: Any, dtableAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val dtable = dtableAny.asInstanceOf[ArrayData]
    val n = codes.numElements()
    // zip_with pads the shorter side with NULLs; one NULL lookup nulls
    // the whole running sum, so a length mismatch is an immediate NULL
    if (n != dtable.numElements()) return null
    val isFloat = innerIsFloat
    var acc = 0.0
    var b = 0
    while (b < n) {
      if (codes.isNullAt(b) || dtable.isNullAt(b)) return null
      val c = codes.getInt(b)
      val t = dtable.getArray(b)
      // element_at(t, c+1) out-of-range → NULL (non-ANSI); c == −1 is the
      // pqCodes sentinel, deliberately NULL here (see adcLookup scaladoc)
      if (c < 0 || c >= t.numElements() || t.isNullAt(c)) return null
      acc += (if (isFloat) t.getFloat(c).toDouble else t.getDouble(c))
      b += 1
    }
    acc
  }

  // Delegation codegen (the OuterFlat pattern): one virtual call into the
  // tight interpreted loop still removes the per-element zip_with array
  // allocation and the per-step interpreted lambda evals.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val expr = ctx.addReferenceObj("adcLookupExpr", this, classOf[AdcLookup].getName)
      val r = ctx.freshName("adcResult")
      s"""
         |Object $r = $expr.nullSafeEval($c, $t);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) $r).doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookup =
    copy(left = newLeft, right = newRight)
}
