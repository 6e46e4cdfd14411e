package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Line-level language mixing — the "is this document actually one
  * language" signal doc-level language ID cannot see: boilerplate
  * scrapes interleave navigation chrome in one language with content in
  * another, and code-mixed pages defeat a single doc-level argmax. Each
  * non-blank line is language-identified with the SAME stopword-argmax
  * heuristic as [[TextFunctions.langId]]; the document summary reports
  * the dominant line language and what fraction of lines agree with it.
  *
  * Shape: lines explode row-locally (no corpus self-join), then ONE
  * shuffle on (doc, lang) partial-aggregates line counts — hot
  * boilerplate lines combine map-side — and the doc-sized count frame
  * feeds two windows sharing one doc-keyed exchange (total + rank).
  * Deterministic: rank ties break on the language code.
  */
object LangMix {

  /** (id, n_lines, n_langs, main_lang, main_frac): non-blank lines
    * only; `main_lang` is the most frequent per-line language ('und'
    * lines count as a language of their own — a doc of undetermined
    * lines IS undetermined), ties broken lexicographically.
    */
  def languageMixture(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val lines = docs
      .select(col(idCol).as("id"),
        explode(filter(split(col(textCol), "\n"), l => trim(l) =!= "")).as("line"))
      .select(col("id"), TextFunctions.langId(col("line")).as("lang"))
    val counts = lines.groupBy("id", "lang").agg(count(lit(1)).as("c"))
    val byDoc = Window.partitionBy(col("id"))
    val rank = Window.partitionBy(col("id")).orderBy(col("c").desc, col("lang"))
    counts
      .select(
        col("id"), col("lang"), col("c"),
        sum(col("c")).over(byDoc).as("n_lines"),
        count(lit(1)).over(byDoc).as("n_langs"),
        row_number().over(rank).as("rn"))
      .filter(col("rn") === 1)
      .select(
        col("id"),
        col("n_lines"),
        col("n_langs"),
        col("lang").as("main_lang"),
        (col("c").cast("double") / col("n_lines").cast("double")).as("main_frac"))
  }
}
