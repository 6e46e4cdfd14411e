package graft.text

import graft.plans.Materialize.PinOps
import graft.text.TextFunctions.wordTokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training and encoding, distributed the
  * way BPE actually distributes: the corpus is touched ONCE (word
  * counting); every merge iteration runs on the DISTINCT-WORD table,
  * which is vocabulary-sized (Heaps' law: millions of rows for a 100 TB
  * corpus, not trillions) and carries each word's frequency — pair
  * counts weighted by word count are identical to counting over the raw
  * corpus, at a millionth of the data.
  *
  * Classic word-level BPE (Sennrich et al., 2016), without the
  * end-of-word marker: words are pre-tokenized ([[TextFunctions.wordTokens]]),
  * symbols start as characters, and each round merges the globally
  * most frequent adjacent symbol pair (ties broken lexicographically —
  * deterministic across runs and partitionings).
  *
  * Per round: pair explosion over the word table (zip_with of adjacent
  * symbols), one map-side-combined groupBy(pair), and the argmax via
  * `orderBy.limit(1)` — TakeOrderedAndProject, no global sort. The
  * merge application is a per-word fold (interpreted HOF on the
  * vocab-sized table only). Encoding joins the corpus's words against
  * the encoded dictionary — a broadcast join at sane vocab sizes; the
  * per-word merge replay never runs corpus-sized.
  */
object Bpe {

  /** (word, cnt) over the corpus — the one corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(wordTokens(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Apply ONE merge (a, b) → "ab" left-to-right greedily to a symbol
    * array (the classic BPE replacement order: "aaa" under (a,a) merges
    * the leftmost pair first → ["aa","a"]).
    */
  def mergeOnce(syms: Column, a: Column, b: Column): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === a && s === b,
          concat(slice(acc, lit(1), size(acc) - 1), array(concat(a, b))))
          .otherwise(concat(acc, array(s)))
    )

  /** Adjacent symbol pairs of an array as (a, b) structs. */
  private def adjacentPairs(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (x, y) => struct(x.as("a"), y.as("b"))
    )

  /** Learn `numMerges` merges from the corpus. Output: (rank, a, b) with
    * rank 0 = first (most frequent) merge. Driver-side loop over
    * vocab-sized frames, each round checkpointed so lineage stays flat;
    * stops early when no adjacent pair is left.
    */
  def fitMerges(docs: DataFrame, numMerges: Int, textCol: String = "text"): DataFrame = {
    require(numMerges >= 0, s"numMerges must be non-negative, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordCounts(docs, textCol)
      .select(split(col("word"), "").as("syms"), col("cnt"))
      .pin(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String)]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val top = words
        .select(explode(adjacentPairs(col("syms"))).as("p"), col("cnt"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      top.headOption match {
        case None => exhausted = true
        case Some((a, b, _)) =>
          merges += ((rank, a, b))
          words = words
            .select(mergeOnce(col("syms"), lit(a), lit(b)).as("syms"), col("cnt"))
            .pin(true)
          rank += 1
      }
    }
    merges.toSeq.toDF("rank", "a", "b").select(col("rank").cast("long"), col("a"), col("b"))
  }

  /** Encode every distinct word by replaying `merges` (a local
    * rank-ordered list) over its character split. Output: (word, toks).
    */
  def encodeDictionary(words: DataFrame, merges: Seq[(String, String)], wordCol: String = "word"): DataFrame =
    words.withColumn(
      "toks",
      merges.foldLeft(split(col(wordCol), ""): Column) {
        case (syms, (a, b)) => mergeOnce(syms, lit(a), lit(b))
      }
    )

  /** Encode the corpus: (id, pos, tok) — word position, then BPE token
    * order within the word. The merge replay runs once per DISTINCT
    * word; the corpus side only pays a dictionary join (broadcast at
    * sane vocab sizes).
    */
  def encode(
      docs: DataFrame,
      merges: Seq[(String, String)],
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val corpusWords = docs.select(
      col(idCol).as("id"),
      posexplode(wordTokens(col(textCol))).as(Seq("pos", "word"))
    )
    val dict = encodeDictionary(corpusWords.select("word").distinct(), merges)
    corpusWords
      .join(broadcast(dict), "word")
      .select(col("id"), col("pos").cast("long").as("pos"),
        posexplode(col("toks")).as(Seq("tpos", "tok")))
      .select(col("id"), col("pos"), col("tpos").cast("long").as("tpos"), col("tok"))
  }
}
