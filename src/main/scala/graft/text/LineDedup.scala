package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-wide line-level exact deduplication (the C4 / RefinedWeb
  * cleanup step): every distinct line is kept exactly once — at its
  * first occurrence in (doc, position) order — and repeated occurrences
  * (boilerplate headers, cookie banners, licence blocks) are deleted
  * from every later document. Documents whose lines are all deleted
  * disappear; survivors keep their remaining lines in original order.
  *
  * Scale shape: two inherent shuffles, both narrow. (1) lines shuffle
  * once on the line VALUE for the first-occurrence rank — the carried
  * payload is (line, doc_id, pos); (2) kept lines shuffle once on
  * doc_id to reassemble. No self-join, no distinct over the corpus,
  * no window without a partition key. A boilerplate line repeated a
  * billion times is one hot reduce key: its group reduces to min(doc,
  * pos) via a rank that only ever emits one row, and AQE splits the
  * skewed partition — nothing accumulates the group in memory (the
  * min-struct aggregate form below is chosen over row_number precisely
  * so map-side partial aggregation bounds the hot key's traffic).
  *
  * Empty lines (and lines that normalize to empty after trimming) are
  * dropped up front: they carry no content and would otherwise make
  * every document "share" a line with every other.
  */
object LineDedup {

  /** (id, pos, line) table: documents split on `sep`, 0-based position,
    * blank lines removed.
    */
  def lineTable(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n"
  ): DataFrame =
    docs
      // Pattern.quote: `sep` is a LITERAL separator (Spark's split takes
      // a regex; DuckDB's string_split is literal — keep them agreeing)
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as(Seq("pos", "line")))
      .filter(trim(col("line")) =!= "")
      .select(col("id"), col("pos").cast("long").as("pos"), col("line"))

  /** The surviving (id, pos, line) rows: each distinct line's single
    * first occurrence by (id, pos). One groupBy(line) with a min-struct
    * aggregate — partial aggregation collapses a hot line to one
    * candidate per map partition before the exchange.
    */
  def keptLines(lines: DataFrame): DataFrame =
    lines
      .groupBy(col("line"))
      .agg(min(struct(col("id"), col("pos"))).as("k"))
      .select(col("k.id").as("id"), col("k.pos").as("pos"), col("line"))

  /** Reassembled corpus after line dedup: (id, text) with surviving
    * lines joined by `sep` in original position order. Documents with
    * zero surviving lines are absent.
    */
  def dedupLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n"
  ): DataFrame =
    keptLines(lineTable(docs, idCol, textCol, sep))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("line")))).as("ls"))
      .select(
        col("id").as(idCol),
        concat_ws(sep, transform(col("ls"), x => x("line"))).as(textCol)
      )

  /** Per-group boilerplate-line report: the top-`topK` lines (by how
    * many DISTINCT documents of the group contain them, ≥ `minDocs`) —
    * the triage view behind per-domain boilerplate removal (CCNet
    * deduplicates lines per shard for exactly this reason: nav bars,
    * cookie banners and licence blocks are per-SOURCE artifacts, and a
    * corpus-global [[dedupLines]] pass can't show you WHICH templates a
    * source is stamping out). Feed the flagged lines back as a removal
    * list, or gate ingestion of a source whose top line covers most of
    * its docs.
    *
    * Shape: lines explode row-locally; the (group, id, line) frame
    * dedups so a doc repeating its own header counts once; the
    * frequency aggregate partial-aggregates the hot boilerplate keys
    * map-side; the rank window runs over the ≥ minDocs SURVIVORS only
    * (filter pushed before the window), partitioned by group. Output:
    * (group, line, n_docs, rank), rank 1 = most-stamped line.
    */
  def boilerplateReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      minDocs: Long = 3L,
      topK: Int = 10,
      sep: String = "\n"
  ): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val lines = docs
      .select(col(groupCol).as("group"), col(idCol).as("id"),
        explode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as("line"))
      .filter(trim(col("line")) =!= "")
      .distinct()
    val freq = lines
      .groupBy(col("group"), col("line"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group"))
      .orderBy(col("n_docs").desc, col("line"))
    freq
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
  }
}
