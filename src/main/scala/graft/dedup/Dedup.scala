package graft.dedup

import graft.text.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design: nothing here is all-pairs. Candidate generation always
  * goes through a bucket join (equal shingle / band signature / hamming
  * block / coarse cell), so the shuffle key space is content-derived and
  * the quadratic blowup is confined to within-bucket comparisons. All
  * hashes are md5-derived (portable across engines for verification).
  */
object Dedup {

  /** Exact dedup by normalized-content fingerprint: one row per distinct
    * fingerprint with the canonical (minimum) id and the duplicate count.
    * A single hash-groupBy — the textbook 100 TB dedup pass.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** Distinct (id, shingle) pairs for `n`-token shingles. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), explode(wordShingles(col(textCol), n)).as("shingle"))
      .distinct()

  /** Near-duplicate pairs by word-n-gram Jaccard similarity >= `threshold`.
    *
    * Candidates come from an equi-join on shared shingles (never a cross
    * join); Jaccard = |∩| / (|A|+|B|-|∩|) via per-doc shingle counts.
    * At scale the shingle strings are first md5-hashed to longs so the
    * shuffle carries 8-byte keys, and hot shingles (appearing in > maxDocFreq
    * docs) are dropped — they generate O(df²) candidate pairs while carrying
    * no discriminative signal.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      threshold: Double,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxDocFreq: Long = 1000
  ): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, n)
      .select(col("id"), md5Hash32(col("shingle")).as("sh"))
    val filtered = sh
      .withColumn("__df", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("sh")))
      .filter(col("__df") <= maxDocFreq)
      .drop("__df")
    val counts = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val common = filtered.as("a")
      .join(filtered.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(broadcast(counts).as("ca"), col("id_a") === col("ca.id"))
      .join(broadcast(counts).as("cb"), col("id_b") === col("cb.id"))
      .select(
        col("id_a"),
        col("id_b"),
        (col("n_common").cast("double") /
          (col("ca.n_sh") + col("cb.n_sh") - col("n_common"))).as("jaccard")
      )
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signature columns: for each of `numHashes` hash seeds, the
    * minimum md5-derived hash over the doc's shingles. Output: (id,
    * minhash_0..minhash_{k-1}).
    */
  def minhashSignatures(
      docs: DataFrame,
      numHashes: Int,
      n: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val sh = shingleTable(docs, idCol, textCol, n)
    val aggs = (0 until numHashes).map { j =>
      min(md5Hash32(concat(col("shingle"), lit(s"#$j")))).as(s"minhash_$j")
    }
    sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH candidate pairs: signatures banded into `numBands` groups; docs
    * sharing any band bucket become candidates. Shuffle key = (band,
    * md5-of-band-signature); bucket sizes bound the join fan-out.
    */
  def minhashCandidatePairs(
      signatures: DataFrame,
      numHashes: Int,
      numBands: Int
  ): DataFrame = {
    require(numHashes % numBands == 0, "numHashes must divide into numBands evenly")
    val rowsPerBand = numHashes / numBands
    val bandCols = (0 until numBands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"minhash_${b * rowsPerBand + r}").cast("string"))
      md5(concat_ws("|", parts: _*)).as(s"band_$b")
    }
    val banded = signatures.select(col("id") +: bandCols: _*)
    val buckets = banded.select(
      col("id"),
      explode(array((0 until numBands).map(b => struct(lit(b).as("band"), col(s"band_$b").as("sig"))): _*))
        .as("bk")
    ).select(col("id"), col("bk.band"), col("bk.sig"))
    buckets.as("a")
      .join(buckets.as("b"), col("a.band") === col("b.band") && col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** SimHash signatures: per token-bit vote (+1 if the md5-derived token
    * hash has bit b set, else −1), signature bit b = 1 iff the weighted
    * vote is positive. `bits` ≤ 32. One explode(tokens)×bits expansion —
    * linear in corpus token count.
    */
  def simhash(
      docs: DataFrame,
      bits: Int = 32,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(bits >= 1 && bits <= 32, "bits must be in [1,32]")
    val toks = docs.select(
      col(idCol).as("id"),
      explode(wordTokens(col(textCol))).as("tok")
    )
    val weighted = toks
      .groupBy("id", "tok")
      .agg(count(lit(1)).as("w"))
      .withColumn("h", md5Hash32(col("tok")))
    val votes = (0 until bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, col("w")).otherwise(-col("w"))).as(s"v_$b")
    }
    val voted = weighted.groupBy("id").agg(votes.head, votes.tail: _*)
    val sig = (0 until bits)
      .map(b => when(col(s"v_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    voted.select(col("id"), sig.as("simhash"))
  }

  /** Near-dup pairs among simhash signatures with hamming distance <=
    * `maxHamming`, using block-permutation candidate buckets: the signature
    * is split into maxHamming+1 blocks; by pigeonhole, any pair within
    * distance shares at least one exact block — so candidates come from
    * equi-joins on (block_idx, block_value), never all-pairs.
    */
  def simhashNearDupPairs(
      signatures: DataFrame,
      bits: Int = 32,
      maxHamming: Int = 3
  ): DataFrame = {
    val nBlocks = maxHamming + 1
    val blockSize = math.ceil(bits.toDouble / nBlocks).toInt
    val blocks = signatures.select(
      col("id"),
      col("simhash"),
      explode(array((0 until nBlocks).map { i =>
        val width = math.min(blockSize, bits - i * blockSize)
        val mask = if (width <= 0) 0L else (1L << width) - 1
        struct(
          lit(i).as("blk"),
          shiftright(col("simhash"), i * blockSize).bitwiseAND(mask).as("v")
        )
      }: _*)).as("b")
    ).select(col("id"), col("simhash"), col("b.blk"), col("b.v"))
    val ham = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
    blocks.as("a")
      .join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), ham.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
