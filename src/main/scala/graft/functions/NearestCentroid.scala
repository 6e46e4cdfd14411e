package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Row-local nearest-centroid argmin over a bounded centroid set — the
  * k-means / IVF / SemDeDup assignment kernel as ONE projection.
  *
  * The composable form (`crossJoin(broadcast(centroids))` → per-(row,
  * centroid) [[SqDist]] → `groupBy(id).min(struct(dist, cid))`)
  * materializes and SHUFFLES N×k rows, each dragging the vector payload
  * through the exchange: with corpus-scaled k (SemDeDup's ~N/250) the
  * shuffle is O(N²/250) rows — measured 48x cost for 10x data at the
  * 100x bench scale. This expression evaluates the same argmin inside the
  * scan projection: zero extra rows, zero shuffle, centroids carried once
  * per task as a reference object (the broadcast analog at expression
  * level), and the inner loop JIT-compiles over primitive double arrays.
  *
  * Semantics are bit-identical to the composable form: per-centroid
  * distance is [[SqDist]]'s strict left-to-right (v_i − c_i)² double
  * accumulation; the winner is the smallest (dist, cid) pair — ties and
  * NaN ordering (NaN sorts greater than every double, Spark's struct-min
  * convention) included. Centroids whose length differs from the vector
  * are skipped (their pair dist would be null and null structs lose a
  * min); a null vector element nulls the result; no length-matching
  * centroid ⇒ null.
  */
case class NearestCentroid(
    child: Expression,
    cids: Array[Long],
    centroids: Array[Array[Double]]
) extends UnaryExpression {

  require(cids.length == centroids.length, "cids and centroids must align")
  require(cids.sameElements(cids.sorted), "cids must be ascending (tie order)")

  override def dataType: DataType =
    StructType(Seq(StructField("cid", LongType), StructField("dist", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nearest_centroid"

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == FloatType || et == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float|double> input, got ${other.catalogString}")
  }

  /** `a` beats `b` in the (dist, cid) min when it is strictly smaller
    * under Spark's double ordering (NaN greatest). Equal dists keep the
    * incumbent — centroids iterate in ascending cid order.
    */
  private def beats(a: Double, b: Double): Boolean =
    (!a.isNaN && b.isNaN) || a < b

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val v = new Array[Double](n)
    var i = 0
    val isFloat = elemType == FloatType
    while (i < n) {
      if (a.isNullAt(i)) return null
      v(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    var best = Double.NaN
    var bestCid = -1L
    var found = false
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      if (ct.length == n) {
        var acc = 0.0
        var j = 0
        while (j < n) {
          val d = v(j) - ct(j)
          acc += d * d
          j += 1
        }
        if (!found || beats(acc, best)) {
          found = true
          best = acc
          bestCid = cids(c)
        }
      }
      c += 1
    }
    if (!found) null else new GenericInternalRow(Array[Any](bestCid, best))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val ids = ctx.addReferenceObj("cids", cids, "long[]")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val ct = ctx.freshName("ct")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestCid = ctx.freshName("bestCid")
      val found = ctx.freshName("found")
      val va = CodeGenerator.getValue(a, elemType, i)
      s"""
         |final int $n = $a.numElements();
         |final double[] $v = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $v[$i] = (double) $va;
         |}
         |if (!${ev.isNull}) {
         |  double $best = Double.NaN;
         |  long $bestCid = -1L;
         |  boolean $found = false;
         |  for (int $c = 0; $c < $cents.length; $c++) {
         |    final double[] $ct = $cents[$c];
         |    if ($ct.length != $n) continue;
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      final double $d = $v[$j] - $ct[$j];
         |      $acc += $d * $d;
         |    }
         |    if (!$found || ((!Double.isNaN($acc) && Double.isNaN($best)) || $acc < $best)) {
         |      $found = true;
         |      $best = $acc;
         |      $bestCid = $ids[$c];
         |    }
         |  }
         |  if (!$found) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[] { $bestCid, $best });
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  /** Column-API entry point: argmin struct (cid, dist) of `vec` against
    * the driver-side centroid set (bounded, vocabulary-sized — the same
    * artifact an IVF index broadcasts).
    */
  def nearest(vec: Column, cids: Array[Long], centroids: Array[Array[Double]]): Column = {
    val order = cids.zipWithIndex.sortBy(_._1).map(_._2)
    ExpressionUtils.column(NearestCentroid(
      ExpressionUtils.expression(vec),
      order.map(cids),
      order.map(centroids)))
  }
}
