package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared in-bucket pair explosion for the bounded-collect candidate
  * pipelines (jaccard / minhash / simhash / embedding near-dup).
  */
object Pairs {

  /** All ordered element pairs (xs(i), xs(j)) for i < j from a SORTED
    * array — callers get `a < b` ordering for free from the collect's
    * sorted-output contract. Runs post-shuffle on per-bucket arrays whose
    * size the caller caps, never on corpus-sized data.
    *
    * Materializes the FULL O(m²) pair array per bucket row before the
    * caller's explode — fine for slim elements (longs, names); for fat
    * payloads (vectors) use [[explodeOrderedPairs]], which streams.
    */
  def orderedPairs(xs: Column, aName: String, bName: String): Column =
    flatten(transform(xs, (x, i) =>
      transform(slice(xs, i + 2, size(xs)), y => struct(x.as(aName), y.as(bName)))))

  /** The same ordered pair set as [[orderedPairs]], exploded in TWO
    * stages — elements first, then each element's tail slice — so peak
    * memory per in-flight row is one input array, never the O(m²) pair
    * array. With vector payloads the one-shot flatten is a memory cliff
    * (a 2,500-member × 64-dim cluster builds a ~1.6 GiB single array and
    * OOMs an 8 GiB heap); this form holds ~one array copy per row.
    * Output columns: (aName, bName), each an element of `arrayCol`.
    */
  def explodeOrderedPairs(df: DataFrame, arrayCol: String, aName: String, bName: String): DataFrame =
    df.select(col(arrayCol).as("__xs"), posexplode(col(arrayCol)).as(Seq("__i", aName)))
      .select(col(aName),
        explode(expr("slice(__xs, __i + 2, size(__xs) - __i - 1)")).as(bName))
}
