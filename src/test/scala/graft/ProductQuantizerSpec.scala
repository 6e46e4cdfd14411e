package graft

import graft.ann.{KMeans, ProductQuantizer => PQ}
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("fit + encode: codes are in range, deterministic, one per block") {
    val model = PQ.fit(emb, numBlocks = 8, k = 16, iters = 2)
    assert(model.centroids.length == 8 && model.centroids.forall(_.length == 16))
    assert(model.centroids.flatten.forall(_.length == 8))
    val codes = PQ.encode(emb, model).as[(Long, Seq[Int])].collect().toMap
    assert(codes.values.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    val again = PQ.encode(emb.repartition(7), model).as[(Long, Seq[Int])].collect().toMap
    assert(codes == again, "encoding must not depend on partitioning")
  }

  test("Lloyd refinement strictly improves on the init codebook q_pq_codes oracles") {
    // q_pq_codes pins the iters=0 (hash-seeded init) codebook against the
    // DuckDB oracle; this pins the complementary claim that the training
    // loop the oracle CANNOT express actually earns its keep: mean squared
    // reconstruction error must drop after Lloyd iterations on the same
    // block geometry.
    def meanRecon(iters: Int): Double = {
      val model = PQ.fit(emb, numBlocks = 4, k = 8, iters = iters)
      emb.select(
          KMeans.sqDist(col("embedding").cast("array<double>"),
            PQ.decodeColumn(model, PQ.codesColumn(model, col("embedding"))))
            .as("d"))
        .agg(avg(col("d"))).collect()(0).getDouble(0)
    }
    val init = meanRecon(0)
    val trained = meanRecon(3)
    assert(trained < init * 0.95,
      f"3 Lloyd iterations must cut mean recon error >5%%: init=$init%.4f trained=$trained%.4f")
  }

  test("searchADC retrieves an exact duplicate vector at rank 1") {
    val base = emb.filter(col("vec_id") < 50).select("vec_id", "embedding")
    val dups = base.select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(dups)
    val model = PQ.fit(corpus, numBlocks = 8, k = 16, iters = 2)
    val codes = PQ.encode(corpus, model)
    val top = PQ.searchADC(codes, base.filter(col("vec_id") < 10), model, kTop = 3)
    // identical vectors share codes -> ADC distance 0 -> the duplicate wins
    val rank1 = top.filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert((0L until 10L).forall(q => rank1(q) == q + 1000), s"rank1=$rank1")
  }

  test("IvfPq: round-trip index finds exact duplicates through residual codes with pruned scan") {
    val base = emb.filter(col("vec_id") < 50).select("vec_id", "embedding")
    val dups = base.select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val corpus = base.unionByName(dups)
    val coarse = KMeans.fit(corpus, k = 4, iters = 2)
    val pq = graft.ann.IvfPq.fitResidualPq(corpus, coarse, numBlocks = 8, k = 16, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
    graft.ann.IvfPq.write(corpus, coarse, pq, dir)
    // model round-trips through parquet
    val reread = graft.ann.IvfPq.readPqModel(spark, dir, numBlocks = 8, k = 16, blockDim = 8)
    assert(reread == pq)
    val top = graft.ann.IvfPq.search(spark, dir, base.filter(col("vec_id") < 10), pq, kTop = 3, nProbe = 1)
    // a duplicate shares cell AND residual codes -> ADC distance 0 -> rank 1
    val rank1 = top.filter(col("rank") === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    assert((0L until 10L).forall(q => rank1(q) == q + 1000), s"rank1=$rank1")
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cid"), "codes scan not partition-pruned")
  }

  test("ADC top-5 pairs are closer in true L2 than random pairs") {
    val model = PQ.fit(emb, numBlocks = 8, k = 16, iters = 2)
    val codes = PQ.encode(emb, model)
    val queries = emb.filter(col("vec_id") < 20)
    val top = PQ.searchADC(codes, queries, model, kTop = 5)
      .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qv")), "query_id")
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")), "neighbor_id")
      .select(KMeans.sqDist(col("qv"), col("nv")).as("d")).as[Double].collect()
    val rand = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < 20 && col("b.vec_id") % 37 === 0 && col("a.vec_id") =!= col("b.vec_id"))
      .select(KMeans.sqDist(col("a.embedding"), col("b.embedding")).as("d")).as[Double].collect()
    assert(top.nonEmpty && rand.nonEmpty)
    val (mTop, mRand) = (top.sum / top.length, rand.sum / rand.length)
    assert(mTop < mRand, s"ADC neighbors ($mTop) not closer than random pairs ($mRand)")
  }
}
