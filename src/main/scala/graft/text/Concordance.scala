package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KWIC (keyword-in-context) concordance — every occurrence of a probe
  * term with its ±k-word context window, the corpus-inspection tool
  * behind "show me how this term is actually used" during curation
  * review (is "crack" drugs, software piracy, or plumbing — decide the
  * blocklist fate from evidence, not from the term alone).
  *
  * Row-local by construction: tokens are exploded WITH the token array
  * carried alongside, so each hit slices its own context directly —
  * no self-join, no window, no second corpus pass. The probe filter
  * lands right after the explode, so only matching positions survive
  * into the (cheap) slice projection.
  *
  * Output: (idCol, pos, left_ctx, term, right_ctx) — one row per
  * occurrence, pos 0-based in token coordinates, contexts space-joined
  * (empty string at document edges, not NULL).
  */
object Concordance {

  def kwic(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      term: String,
      k: Int = 3): DataFrame = {
    require(term.nonEmpty, "probe term must be non-empty")
    require(k >= 1 && k <= 50, s"context width must be in [1, 50], got $k")
    val toks = TextFunctions.wordTokens(col(textCol))
    docs
      .select(col(idCol), toks.as("__ts"))
      .select(col(idCol), col("__ts"), posexplode(col("__ts")).as(Seq("pos", "__w")))
      .filter(col("__w") === lit(term))
      .select(
        col(idCol),
        col("pos").cast("long").as("pos"),
        // slice() is 1-based and clamps the LENGTH, not the start:
        // compute both endpoints in 0-based token coords first
        concat_ws(" ", slice(col("__ts"),
          greatest(lit(1), col("pos") - lit(k) + lit(1)),
          least(col("pos"), lit(k)))).as("left_ctx"),
        col("__w").as("term"),
        concat_ws(" ", slice(col("__ts"), col("pos") + lit(2), lit(k))).as("right_ctx"))
  }
}
