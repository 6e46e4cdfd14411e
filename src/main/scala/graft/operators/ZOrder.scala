package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data layout: bit-
  * interleave two key columns into one sort key so that sorting/range-
  * partitioning by it co-locates rows that are close in BOTH dimensions.
  * Written this way, parquet row-group min/max statistics stay tight on
  * both columns simultaneously, and scans filtering on either key prune
  * most files — the standard layout trick for fact tables queried along
  * two independent dimensions (Delta/Iceberg OPTIMIZE ZORDER; here as a
  * plain column function + a range-partitioned write).
  *
  * The z-value is pure per-row arithmetic (codegen'd shifts/masks, no
  * UDF); the write is ONE `repartitionByRange` — a range exchange over
  * the sampled z-distribution, the same cost as any global sort write.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative int
    * columns: result bit 2i is bit i of `x`, bit 2i+1 is bit i of `y`.
    * `bits` ≤ 31 keeps the result in a positive long. Values are masked
    * into range first (callers quantize wider domains down — rank or
    * bucket them — before interleaving; masking high bits would fold
    * distant values together silently otherwise, so keep `bits` honest).
    */
  def interleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1,31]")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(x.cast("long"), i).bitwiseAND(1), 2 * i)
      val yb = shiftleft(shiftright(y.cast("long"), i).bitwiseAND(1), 2 * i + 1)
      xb + yb
    }.reduce(_ + _)
  }

  /** The input with a `zvalue` column appended. */
  def withZValue(df: DataFrame, xCol: String, yCol: String, bits: Int = 16): DataFrame =
    df.withColumn("zvalue", interleave(col(xCol), col(yCol), bits))

  /** Write `df` z-order-clustered on (xCol, yCol): range-partitioned and
    * in-partition-sorted by the interleaved key, so every output file
    * covers a contiguous z-range — tight min/max on both columns.
    */
  def clusteredWrite(
      df: DataFrame,
      path: String,
      xCol: String,
      yCol: String,
      numFiles: Int,
      bits: Int = 16
  ): Unit =
    withZValue(df, xCol, yCol, bits)
      .repartitionByRange(numFiles, col("zvalue"))
      .sortWithinPartitions("zvalue")
      .drop("zvalue")
      .write.mode("overwrite").parquet(path)

  /** Hilbert-curve index for two dimensions — [[zValue]]'s
    * better-locality sibling: Morton order takes long diagonal jumps at
    * quadrant boundaries (adjacent z-values can be far apart in space),
    * while the Hilbert curve is CONTINUOUS, so range-partitioning by it
    * keeps every file's rows in one compact blob — measurably fewer
    * files overlap a box query. The price is the per-level rotation,
    * here an integer fold over `bits` levels (the classic d2xy
    * inverse): rx/ry quadrant bits, d += s²·((3rx) XOR ry), rotate.
    * Pure integer arithmetic — any engine replays it bit-for-bit.
    *
    * Inputs are column values already scaled to [0, 2^bits); the fold
    * carries (d, x, y) as a 3-long array through the per-level
    * transform, exactly [[graft.text.Bpe.mergeOnce]]'s accumulator
    * discipline. bits ≤ 31 keeps s² in the long range trivially.
    */
  def hilbertValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val init = array(lit(0L), x.cast("long"), y.cast("long"))
    val folded = aggregate(
      // levels s = 2^(bits-1) … 1, descending
      sequence(lit(bits - 1), lit(0), lit(-1)),
      init,
      (acc, lv) => {
        // 2^lv as an exact double→long (shiftleft needs a literal shift)
        val s = pow(lit(2.0), lv.cast("double")).cast("long")
        val d = element_at(acc, 1)
        val cx = element_at(acc, 2)
        val cy = element_at(acc, 3)
        val rx = when(cx.bitwiseAND(s) > 0L, lit(1L)).otherwise(lit(0L))
        val ry = when(cy.bitwiseAND(s) > 0L, lit(1L)).otherwise(lit(0L))
        val d2 = d + s * s * ((lit(3L) * rx).bitwiseXOR(ry))
        // rotate the quadrant so the sub-curve orientation is right:
        // ry=0: (rx=1 ⇒ reflect), then swap x/y
        val fx = when(ry === 0L && rx === 1L, s - 1L - cx).otherwise(cx)
        val fy = when(ry === 0L && rx === 1L, s - 1L - cy).otherwise(cy)
        val nx = when(ry === 0L, fy).otherwise(fx)
        val ny = when(ry === 0L, fx).otherwise(fy)
        array(d2, nx, ny)
      })
    element_at(folded, 1)
  }
}
