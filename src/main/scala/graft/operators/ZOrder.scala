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
}
