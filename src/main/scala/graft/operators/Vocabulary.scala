package graft.operators

import graft.meds.Meds
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vocabulary index assignment over the code-metadata table.
  *
  * Reference: src/MEDS_transforms/fit_vocabulary_indices.py:102-195
  * (`lexicographic_indices`): codes (with modifiers) are ranked in
  * lexicographic order, 1-based — index 0 is reserved for padding /
  * unknown.
  */
object Vocabulary {

  /** Append `code/vocab_index` = 1-based lexicographic rank of
    * (code, modifiers), nulls first (fit_vocabulary_indices.py:161-189).
    *
    * The code-metadata table is vocabulary-sized (≪ driver memory even for
    * 100 TB cohorts), so a single-partition window is acceptable here; the
    * measurement table is never involved.
    */
  def lexicographicIndices(
      codeMetadata: DataFrame,
      codeModifiers: Seq[String] = Nil
  ): DataFrame = {
    val sortCols = (Meds.Code +: codeModifiers).map(c => col(c).asc_nulls_first)
    val w = Window.orderBy(sortCols: _*)
    codeMetadata.withColumn("code/vocab_index", row_number().over(w).cast("long"))
  }

  /** Same ranking without the single-partition window: a range-partitioned
    * sort (orderBy) followed by zipWithIndex, which computes per-partition
    * offsets with one lightweight count job and assigns global ranks in
    * parallel. Use when the "vocabulary" isn't vocabulary-sized — ranking
    * patients, documents, or any table too large to funnel through one
    * task. Identical output to [[lexicographicIndices]].
    */
  def lexicographicIndicesScalable(
      codeMetadata: DataFrame,
      codeModifiers: Seq[String] = Nil
  ): DataFrame = {
    val spark = codeMetadata.sparkSession
    val sortCols = (Meds.Code +: codeModifiers).map(c => col(c).asc_nulls_first)
    val sorted = codeMetadata.orderBy(sortCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema :+ org.apache.spark.sql.types.StructField("code/vocab_index", org.apache.spark.sql.types.LongType))
    val indexed = sorted.rdd
      .zipWithIndex()
      .map { case (row, idx) => org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (idx + 1)) }
    spark.createDataFrame(indexed, schema)
  }
}
