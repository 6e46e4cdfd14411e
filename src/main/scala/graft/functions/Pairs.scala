package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared in-bucket pair explosion for the bounded-collect candidate
  * pipelines (jaccard / minhash / simhash / embedding near-dup).
  */
object Pairs {

  /** All ordered element pairs (xs(i), xs(j)) for i < j from a SORTED
    * array — callers get `a < b` ordering for free from the collect's
    * sorted-output contract. Runs post-shuffle on per-bucket arrays whose
    * size the caller caps, never on corpus-sized data.
    */
  def orderedPairs(xs: Column, aName: String, bName: String): Column =
    flatten(transform(xs, (x, i) =>
      transform(slice(xs, i + 2, size(xs)), y => struct(x.as(aName), y.as(bName)))))
}
