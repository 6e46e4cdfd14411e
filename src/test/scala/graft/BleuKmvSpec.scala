package graft

import graft.operators.Sketches
import graft.text.Bleu
import org.apache.spark.sql.functions._

/** Round-8 batch B: corpus BLEU and the KMV distinct/overlap sketch. */
class BleuKmvSpec extends SparkSpec {
  import spark.implicits._

  private def bleuRow(pairs: Seq[(Long, String, String)]) =
    Bleu.corpusBleu(pairs.toDF("id", "cand", "ref"), Seq.empty, "id", "cand", "ref")
      .collect().head

  test("corpusBleu: identical pair scores 1.0 with unit precisions") {
    val r = bleuRow(Seq((1L, "the cat sat on the mat", "the cat sat on the mat")))
    assert(r.getAs[Double]("bp") == 1.0)
    (1 to 4).foreach(n => assert(r.getAs[Double](s"p$n") == 1.0, s"p$n"))
    assert(r.getAs[Double]("bleu") == 1.0)
  }

  test("corpusBleu: disjoint vocabulary scores 0") {
    val r = bleuRow(Seq((1L, "aa bb cc dd ee", "vv ww xx yy zz")))
    assert(r.getAs[Double]("p1") == 0.0)
    assert(r.getAs[Double]("bleu") == 0.0)
  }

  test("corpusBleu: clipping caps repeated candidate grams at the reference count") {
    // cand "the the the the" vs ref "the cat": clip1 = min(4, 1) = 1 -> p1 = 1/4
    val r = bleuRow(Seq((1L, "the the the the", "the cat")))
    assert(r.getAs[Double]("p1") == 0.25, s"p1=${r.getAs[Double]("p1")}")
    // no shared bigram -> p2 = 0 -> bleu = 0 (corpus convention, no smoothing)
    assert(r.getAs[Double]("p2") == 0.0)
    assert(r.getAs[Double]("bleu") == 0.0)
  }

  test("corpusBleu: brevity penalty punishes short candidates, never long ones") {
    val short = bleuRow(Seq((1L, "the cat sat on", "the cat sat on the mat today")))
    assert(short.getAs[Double]("bp") < 1.0)
    val exp = math.exp(1.0 - 7.0 / 4.0)
    assert(math.abs(short.getAs[Double]("bp") - exp) < 1e-5)
    val long = bleuRow(Seq((1L, "the cat sat on the mat today", "the cat sat")))
    assert(long.getAs[Double]("bp") == 1.0)
  }

  test("corpusBleu: pairs shorter than 4 tokens give NULL p4 and NULL bleu, not fake zeros") {
    val r = bleuRow(Seq((1L, "the cat", "the cat")))
    assert(r.isNullAt(r.fieldIndex("p4")), "no 4-grams exist -> p4 must be NULL")
    assert(r.isNullAt(r.fieldIndex("bleu")), "undefined precision -> bleu must be NULL")
  }

  test("corpusBleu: corpus pooling sums counts across pairs (not mean of per-pair scores)") {
    // pair A matches fully (4 tokens), pair B not at all (4 tokens):
    // every pooled pₙ = A's matches over both pairs' totals = 1/2, so
    // corpus BLEU = 0.5 — while averaging per-pair sentence BLEU {1, 0}
    // after a zero-smoothing would differ the moment pairs are uneven
    val r = bleuRow(Seq(
      (1L, "aa bb cc dd", "aa bb cc dd"),
      (2L, "ee ff gg hh", "pp qq rr ss")))
    assert(r.getAs[Long]("n_pairs") == 2)
    assert(r.getAs[Double]("p1") == 0.5)
    assert(r.getAs[Double]("p4") == 0.5)
    assert(r.getAs[Double]("bleu") == 0.5)
  }

  test("corpusBleu: grouped output keys precisions per group") {
    val df = Seq(
      ("g1", 1L, "aa bb cc dd", "aa bb cc dd"),
      ("g2", 2L, "ee ff gg hh", "pp qq rr ss")
    ).toDF("g", "id", "cand", "ref")
    val out = Bleu.corpusBleu(df, Seq("g"), "id", "cand", "ref")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    assert(out("g1").getAs[Double]("bleu") == 1.0)
    assert(out("g2").getAs[Double]("bleu") == 0.0)
  }

  // ----------------------------------------------------------------- KMV

  test("kmvDistinct: below k the sketch IS the exact distinct set") {
    val df = (0 until 100).map(i => ("g", "item" + (i % 17))).toDF("g", "item")
    val r = Sketches.kmvDistinct(df, Seq("g"), "item", k = 64).collect().head
    assert(r.getSeq[Long](r.fieldIndex("kmv")).size == 17)
    assert(r.getAs[Double]("est_distinct") == 17.0)
  }

  test("kmvDistinct: estimate lands within ~3/sqrt(k) of the truth") {
    val n = 20000
    val df = (0 until n).map(i => ("g", s"u$i")).toDF("g", "item")
    val k = 512
    val est = Sketches.kmvDistinct(df, Seq("g"), "item", k).select("est_distinct").as[Double].head()
    val rse = 3.0 / math.sqrt(k.toDouble) // ~13% at k=512
    assert(math.abs(est - n) / n < rse, s"est=$est truth=$n rse bound=$rse")
  }

  test("kmvDistinct: partitioning-invariant (map-side heaps merge losslessly)") {
    val df = (0 until 5000).map(i => ("g", s"u${i % 900}")).toDF("g", "item")
    val a = Sketches.kmvDistinct(df.repartition(1), Seq("g"), "item", 128)
      .select("kmv").as[Seq[Long]].head()
    val b = Sketches.kmvDistinct(df.repartition(16), Seq("g"), "item", 128)
      .select("kmv").as[Seq[Long]].head()
    assert(a == b, "k smallest distinct hashes must not depend on partitioning")
  }

  test("kmvOverlap: identical sets estimate Jaccard 1, disjoint sets ~0") {
    val items = (0 until 3000).map(i => s"w$i")
    val same = (items.map(("a", _)) ++ items.map(("b", _))).toDF("g", "item")
    val sk1 = Sketches.kmvDistinct(same, Seq("g"), "item", 256)
    val r1 = Sketches.kmvOverlap(sk1, "g", 256).collect().head
    assert(r1.getAs[Double]("est_jaccard") == 1.0)
    assert(math.abs(r1.getAs[Double]("est_union") - r1.getAs[Double]("est_a")) < 1e-9)

    val disj = (items.map(("a", _)) ++ (0 until 3000).map(i => ("b", s"z$i"))).toDF("g", "item")
    val r2 = Sketches.kmvOverlap(Sketches.kmvDistinct(disj, Seq("g"), "item", 256), "g", 256)
      .collect().head
    assert(r2.getAs[Double]("est_jaccard") < 0.02, s"jac=${r2.getAs[Double]("est_jaccard")}")
  }

  test("kmvOverlap: half-overlapping sets estimate J ~ 1/3 and sane intersection") {
    // |A|=|B|=4000, |A∩B|=2000, |A∪B|=6000 -> J = 1/3
    val a = (0 until 4000).map(i => ("a", s"w$i"))
    val b = (2000 until 6000).map(i => ("b", s"w$i"))
    val r = Sketches.kmvOverlap(
      Sketches.kmvDistinct((a ++ b).toDF("g", "item"), Seq("g"), "item", 512), "g", 512)
      .collect().head
    val jac = r.getAs[Double]("est_jaccard")
    assert(math.abs(jac - 1.0 / 3.0) < 0.1, s"jac=$jac")
    val inter = r.getAs[Double]("est_intersection")
    assert(math.abs(inter - 2000.0) / 2000.0 < 0.25, s"inter=$inter")
  }
}
