package graft

import graft.operators.ZOrder
import graft.pipeline.Sampling
import graft.text.{Bpe, LineDedup}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants over ScalaCheck-generated data. Each
  * property is evaluated over ONE generated dataset in ONE Spark job
  * (not forAll-per-case, which would pay job-launch latency per
  * sample) — the row count is the sample count.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.iterate((Seed(seed), Option.empty[A])) { case (s, _) =>
      val (v, s2) = (g.apply(Gen.Parameters.default, s), s.next)
      (s2, v)
    }.drop(1).take(n).flatMap(_._2).toSeq

  test("z-order interleave round-trips: de-interleaving recovers both inputs exactly") {
    val bits = 12
    val gen = Gen.zip(Gen.chooseNum(0L, (1L << bits) - 1), Gen.chooseNum(0L, (1L << bits) - 1))
    val pairs = sample(gen, 600, seed = 7L)
    val x = col("z") // de-interleave: gather even (x) and odd (y) bits
    val xBack = (0 until bits).map(i => shiftleft(shiftright(x, 2 * i).bitwiseAND(1), i)).reduce(_ + _)
    val yBack = (0 until bits).map(i => shiftleft(shiftright(x, 2 * i + 1).bitwiseAND(1), i)).reduce(_ + _)
    val bad = pairs.toDF("a", "b")
      .withColumn("z", ZOrder.interleave(col("a"), col("b"), bits))
      .filter(xBack =!= col("a") || yBack =!= col("b"))
      .count()
    assert(bad == 0L)
  }

  test("BPE encoding always reassembles to the original word, for any merge budget") {
    val word = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val doc = Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val docs = sample(doc, 40, seed = 11L).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (merges <- Seq(0, 3, 10)) {
      val m = Bpe.fitMerges(docs, numMerges = merges)
        .as[(Long, String, String)].collect().sortBy(_._1).map(t => (t._2, t._3)).toSeq
      val bad = Bpe.encode(docs, m)
        .groupBy("id", "pos")
        .agg(concat_ws("", sort_array(collect_list(struct(col("tpos"), col("tok"))))
          .cast("array<struct<tpos:long,tok:string>>").getField("tok")).as("rebuilt"))
        .join(docs.select(col("doc_id").as("id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word"))), Seq("id", "pos"))
        .filter(col("rebuilt") =!= col("word"))
        .count()
      assert(bad == 0L, s"merge budget $merges broke word reassembly")
    }
  }

  test("deterministic sample membership is identical under any repartitioning") {
    val ids = sample(Gen.chooseNum(0L, 1000000L), 800, seed = 13L).distinct
    val df = ids.toDF("id")
    val base = df.filter(Sampling.sampleHash(col("id"), 0.37, "seedX"))
      .as[Long].collect().toSet
    for (parts <- Seq(1, 5, 13)) {
      val again = df.repartition(parts)
        .filter(Sampling.sampleHash(col("id"), 0.37, "seedX"))
        .as[Long].collect().toSet
      assert(again == base, s"membership changed at $parts partitions")
    }
    assert(base.nonEmpty && base.size < ids.size)
  }

  test("funnel reached-counts are antitone in the step list: adding a step never raises anyone's progress") {
    val ev = Gen.zip(Gen.chooseNum(1L, 40L), Gen.chooseNum(0L, 500000L),
      Gen.oneOf("a", "b", "c", "d"))
    val rows = sample(ev, 500, seed = 19L).zipWithIndex.map { case ((u, t, tp), i) =>
      (u, new java.sql.Timestamp(1700000000000L + t), tp, i.toLong)
    }.toDF("user_id", "ts", "event_type", "event_id")
    def reached(steps: Seq[String]): Map[Long, Long] =
      graft.operators.Funnel.funnel(rows, "user_id", "ts", "event_type", steps)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = reached(Seq("a", "b"))
    val three = reached(Seq("a", "b", "c"))
    // same users enter (step 1 identical), nobody's progress through the
    // shared prefix changes
    assert(two.keySet == three.keySet)
    for ((u, r3) <- three) assert(math.min(r3, 2L) == math.min(two(u), 2L), s"user $u")
  }

  test("weighted sampling with uniform weights equals the n smallest-hash rows' count and respects n") {
    val ids = sample(Gen.chooseNum(0L, 1000000L), 400, seed = 23L).distinct
    val df = ids.toDF("id").withColumn("w", lit(1.0))
    for (n <- Seq(1, 17, 100)) {
      val out = Sampling.weightedSampleN(df, "id", "w", n, "s").collect()
      assert(out.length == math.min(n, ids.size))
    }
    // heavier rows win against uniform: double one row's weight vs all-1
    val boosted = df.withColumn("w", when(col("id") === ids.head, 1e9).otherwise(1.0))
    val picked = Sampling.weightedSampleN(boosted, "id", "w", 1, "s")
      .head().getLong(0)
    assert(picked == ids.head)
  }

  test("containment dominates jaccard on every candidate pair") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val doc = Gen.chooseNum(6, 14).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    val docs = sample(doc, 50, seed = 29L).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val jac = graft.dedup.Dedup.ngramJaccardPairs(docs, threshold = 0.0, n = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val cont = graft.dedup.Dedup.ngramContainmentPairs(docs, threshold = 0.0, n = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    assert(jac.keySet == cont.keySet && jac.nonEmpty)
    for ((k, j) <- jac) {
      val (ca, cb) = cont(k)
      assert(ca >= j - 1e-12 && cb >= j - 1e-12, s"pair $k")
    }
  }

  test("line dedup output contains every distinct line exactly once, order preserved") {
    val line = Gen.oneOf("header", "footer", "alpha beta", "gamma", "delta five", "unique")
    val doc = Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, line).map(_.mkString("\n")))
    val docs = sample(doc, 60, seed = 17L).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, "doc_id", "text").as[(Long, String)].collect()
    val allLines = out.flatMap(_._2.split("\n"))
    // every distinct input line appears exactly once across the corpus
    val distinctIn = docs.as[(Long, String)].collect().flatMap(_._2.split("\n"))
      .filter(_.trim.nonEmpty).toSet
    assert(allLines.toSet == distinctIn && allLines.length == allLines.toSet.size)
    // and each output doc's lines form a subsequence of its original
    // lines (intra-doc duplicates collapse to the first occurrence, so
    // a plain contains-filter would be wrong)
    def isSubseq(xs: Seq[String], ys: Seq[String]): Boolean = {
      var i = 0
      for (y <- ys if i < xs.length) if (xs(i) == y) i += 1
      i == xs.length
    }
    val orig = docs.as[(Long, String)].collect().toMap
    for ((id, text) <- out)
      assert(isSubseq(text.split("\n").toSeq, orig(id).split("\n").toSeq), s"doc $id reordered")
  }
}
