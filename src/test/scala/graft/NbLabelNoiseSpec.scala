package graft

import graft.operators.LabelNoise
import graft.text.NaiveBayes
import org.apache.spark.sql.functions._

/** Round-8 batch D: Bernoulli naive Bayes + confident-learning noise. */
class NbLabelNoiseSpec extends SparkSpec {
  import spark.implicits._

  // two separable classes: "cats" docs share cat words, "cars" car words
  private def separable(flips: Set[Long] = Set.empty) =
    ((1L to 20L).map(i => (i, s"cat kitten purr whiskers c$i", "cats")) ++
      (21L to 40L).map(i => (i, s"car engine wheel road c$i", "cars")))
      .map { case (id, t, l) =>
        (id, t, if (flips.contains(id)) (if (l == "cats") "cars" else "cats") else l)
      }
      .toDF("id", "text", "label")

  private def top1(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col("posterior").desc, col("class").asc)))
      .filter(col("rn") === 1)

  test("bernoulliNb: separable classes classify perfectly; posteriors sum to ~1") {
    val scored = NaiveBayes.bernoulliNb(separable(), "id", "text", "label")
    val t = top1(scored).select("label", "class").collect()
    assert(t.forall(r => r.getString(0) == r.getString(1)), "separable corpus must self-classify")
    val sums = scored.groupBy("id").agg(sum("posterior").as("s")).select("s").as[Double].collect()
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-4, s"posteriors must sum to 1, got $s"))
  }

  test("bernoulliNb: hand-computed two-doc model") {
    // d1 = "a b" labeled x, d2 = "b c" labeled y; vocab {a,b,c}, alpha=1
    val df = Seq((1L, "a b", "x"), (2L, "b c", "y")).toDF("id", "text", "label")
    val scored = NaiveBayes.bernoulliNb(df, "id", "text", "label")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("class")) -> r.getAs[Double]("log_post")).toMap
    // p(w|c) for nc=1, alpha=1: present -> 2/3, absent -> 1/3
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val wPresent = r6(math.log(2.0 / 3.0) - math.log(1.0 / 3.0)) // ln2
    val l1pP = r6(math.log(1.0 / 3.0)); val l1pA = r6(math.log(2.0 / 3.0))
    // class x: S = 2*ln(1/3)+ln(2/3) (a,b present; c absent), prior ln(1/2)
    val constX = (l1pP + l1pP + l1pA) + math.log(0.5)
    // d1 against x: present words a,b both have weight ln2
    val expected = r6(constX + (wPresent + wPresent))
    assert(math.abs(scored((1L, "x")) - expected) < 1e-6,
      s"log_post(d1,x)=${scored((1L, "x"))} expected $expected")
  }

  test("bernoulliNb: empty-token docs emit no rows") {
    val df = Seq((1L, "a b", "x"), (2L, "123 456", "y")).toDF("id", "text", "label")
    val ids = NaiveBayes.bernoulliNb(df, "id", "text", "label")
      .select("id").distinct().as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("confidentJoint: planted label flips land on the off-diagonal") {
    val flips = Set(3L, 25L) // one cat mislabeled cars, one car mislabeled cats
    val scored = NaiveBayes.bernoulliNb(separable(flips), "id", "text", "label")
    val cj = LabelNoise.confidentJoint(scored, "id", "label", "class", "posterior")
      .collect()
      .map(r => (r.getAs[String]("label"), r.getAs[String]("confident_class")) -> r.getAs[Long]("n"))
      .toMap
    // the flipped docs: given-label != confident class
    assert(cj.getOrElse(("cars", "cats"), 0L) >= 1L, s"flipped cat not flagged: $cj")
    assert(cj.getOrElse(("cats", "cars"), 0L) >= 1L, s"flipped car not flagged: $cj")
    // the diagonal still dominates
    assert(cj(("cats", "cats")) > 15L && cj(("cars", "cars")) > 15L)
  }

  test("confidentJoint: label totals and unconfident counts reconcile") {
    val scored = NaiveBayes.bernoulliNb(separable(), "id", "text", "label")
    val rows = LabelNoise.confidentJoint(scored, "id", "label", "class", "posterior").collect()
    rows.groupBy(_.getAs[String]("label")).foreach { case (_, rs) =>
      val nLabel = rs.head.getAs[Long]("n_label")
      val counted = rs.map(_.getAs[Long]("n")).sum
      val uncf = rs.head.getAs[Long]("n_unconfident")
      assert(counted + uncf == nLabel, s"$counted + $uncf != $nLabel")
    }
  }
}
