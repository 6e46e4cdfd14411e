package graft

import graft.operators.{Diversity, Rfm, Trend}
import graft.pipeline.Sampling
import org.apache.spark.sql.functions._

/** Round-6 sixth batch: Theil–Sen / Mann–Kendall robust trend,
  * diversity indices, RFM segmentation, token-budget epoch allocation.
  */
class Round6fOpsSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------------- theilSen

  test("theilSen: exact line recovered, single outlier cannot move it") {
    val line = (1 to 20).map(i => ("g", i.toLong, i.toDouble, 3.0 * i + 7))
    val r = Trend.theilSen(line.toDF("g", "id", "x", "y"), Seq("g"), "id", "x", "y")
      .collect().head
    assert(r.getAs[Long]("n") == 20L && r.getAs[Long]("n_slopes") == 190L)
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-12)
    // poison one point hard: OLS would shift, the median slope stays 3
    val poisoned = line.dropRight(1) :+ (("g", 20L, 20.0, 1e6))
    val rp = Trend.theilSen(poisoned.toDF("g", "id", "x", "y"), Seq("g"), "id", "x", "y")
      .collect().head
    assert(math.abs(rp.getAs[Double]("slope") - 3.0) < 1e-12, "29% breakdown point")
  }

  test("theilSen: vertical series (all x tied) emits NULL slope, 0 slopes") {
    val v = (1 to 5).map(i => ("g", i.toLong, 1.0, i.toDouble))
    val r = Trend.theilSen(v.toDF("g", "id", "x", "y"), Seq("g"), "id", "x", "y")
      .collect().head
    assert(r.getAs[Long]("n_slopes") == 0L && r.isNullAt(r.fieldIndex("slope")))
  }

  test("theilSen: even slope count takes the mean of the two middles") {
    // 3 points, slopes: (1,2):1, (1,3):3, (2,3):5 -> median 3 (odd);
    // 4 points all distinct slopes -> mean of middle two
    val p4 = Seq(("g", 1L, 0.0, 0.0), ("g", 2L, 1.0, 1.0),
      ("g", 3L, 2.0, 4.0), ("g", 4L, 3.0, 9.0)).toDF("g", "id", "x", "y")
    // slopes: 1,2,3 (from 0), 3,4 (from 1), 5 (from 2) -> sorted 1,2,3,3,4,5
    val r = Trend.theilSen(p4, Seq("g"), "id", "x", "y").collect().head
    assert(r.getAs[Long]("n_slopes") == 6L)
    assert(math.abs(r.getAs[Double]("slope") - 3.0) < 1e-12)
  }

  // ----------------------------------------------------------- mannKendall

  test("mannKendall: strictly increasing series has S = n(n-1)/2 and large z") {
    val up = (1 to 20).map(i => ("g", i.toLong, i.toLong, i.toDouble))
    val r = Trend.mannKendall(up.toDF("g", "t", "id", "y"), Seq("g"), "t", "id", "y")
      .collect().head
    assert(r.getAs[Long]("n") == 20L && r.getAs[Long]("s") == 190L)
    // no ties: Var = 20*19*45/18 = 950
    assert(math.abs(r.getAs[Double]("var_s") - 950.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") - 189.0 / math.sqrt(950.0)) < 1e-9)
    assert(r.getAs[Double]("z") > 1.96, "monotone trend is significant")
  }

  test("mannKendall: constant series and tie correction") {
    val const = (1 to 10).map(i => ("g", i.toLong, i.toLong, 5.0))
    val rc = Trend.mannKendall(const.toDF("g", "t", "id", "y"), Seq("g"), "t", "id", "y")
      .collect().head
    // all tied: tsum = 10*9*25 = 2250 = n(n-1)(2n+5) -> Var 0 -> NULL z
    assert(rc.getAs[Long]("s") == 0L && rc.getAs[Double]("var_s") == 0.0)
    assert(rc.isNullAt(rc.fieldIndex("z")))
    // decreasing: S = -n(n-1)/2, continuity correction toward zero
    val down = (1 to 10).map(i => ("g", i.toLong, i.toLong, -i.toDouble))
    val rd = Trend.mannKendall(down.toDF("g", "t", "id", "y"), Seq("g"), "t", "id", "y")
      .collect().head
    assert(rd.getAs[Long]("s") == -45L && rd.getAs[Double]("z") < -1.96)
  }

  test("mannKendall: same-time rows order by id deterministically") {
    // two rows at t=1 (ids 1,2 with y 1,2) then t=2 y=3: all pairs concordant
    val df = Seq(("g", 1L, 1L, 1.0), ("g", 1L, 2L, 2.0), ("g", 2L, 3L, 3.0))
      .toDF("g", "t", "id", "y")
    val r = Trend.mannKendall(df, Seq("g"), "t", "id", "y").collect().head
    assert(r.getAs[Long]("s") == 3L)
  }

  // ------------------------------------------------------------- diversity

  test("diversity: uniform categories hit the Hill-number ideal") {
    // 4 categories x 25 rows: H = ln 4, simpson = 1/4, hill1 = hill2 = 4
    val u = (1 to 100).map(i => ("g", s"c${i % 4}")).toDF("g", "c")
    val r = Diversity.indices(u, Seq("g"), "c").collect().head
    assert(r.getAs[Long]("n") == 100L && r.getAs[Long]("richness") == 4L)
    assert(math.abs(r.getAs[Double]("shannon") - math.log(4.0)) < 1e-5)
    assert(math.abs(r.getAs[Double]("simpson") - 0.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("hill1") - 4.0) < 1e-4)
    assert(math.abs(r.getAs[Double]("hill2") - 4.0) < 1e-12)
  }

  test("diversity: concentration collapses the effective number") {
    // 97 of one kind + 3 singletons: richness 4 but hill2 ~ 1.06
    val skew = ((1 to 97).map(_ => ("g", "big")) ++ Seq(("g", "a"), ("g", "b"), ("g", "c")))
      .toDF("g", "c")
    val r = Diversity.indices(skew, Seq("g"), "c").collect().head
    assert(r.getAs[Long]("richness") == 4L)
    assert(r.getAs[Double]("hill2") < 1.1, "effective number ~1 under concentration")
    // single category: H = 0, lambda = 1, both effective numbers 1
    val one = (1 to 10).map(_ => ("h", "only")).toDF("g", "c")
    val r1 = Diversity.indices(one, Seq("g"), "c").collect().head
    // Shannon carries the r6 term-rounding residue (~1e-8), not exact 0
    assert(math.abs(r1.getAs[Double]("shannon")) < 1e-6)
    assert(r1.getAs[Double]("simpson") == 1.0 && r1.getAs[Double]("hill2") == 1.0)
    assert(math.abs(r1.getAs[Double]("hill1") - 1.0) < 1e-6)
  }

  // ------------------------------------------------------------------- rfm

  test("rfm: quantile codes are deterministic and ordered right") {
    // 10 customers in one segment: customer i ordered i-th on every metric
    val rows = for (i <- 1 to 10; j <- 1 to i) yield
      ("SEG", i.toLong, java.sql.Timestamp.valueOf(f"2024-01-${i}%02d 00:00:00"), i * 10.0)
    val df = rows.toDF("seg", "cust", "ts", "amt")
    val out = Rfm.rfm(df, "seg", "cust", "ts", "amt", nBins = 5)
      .collect().map(r => r.getAs[Long]("entity") -> r).toMap
    // customer 10: most recent, most frequent, biggest -> 555
    assert(out(10L).getAs[Long]("rfm") == 555L)
    assert(out(1L).getAs[Long]("rfm") == 111L)
    // frequency counts the raw rows
    assert(out(7L).getAs[Long]("frequency") == 7L)
    // monetary is the exact sum: i rows of i*10
    assert(math.abs(out(7L).getAs[Double]("monetary") - 7 * 70.0) < 1e-9)
    // ntile balance: two customers per bin
    val rBins = out.values.map(_.getAs[Long]("r")).toSeq.sorted
    assert(rBins == Seq(1L, 1L, 2L, 2L, 3L, 3L, 4L, 4L, 5L, 5L))
  }

  // ------------------------------------------------------- epochAllocation

  test("epochAllocation: cap binds, unspent reports the shortfall") {
    val df = (
      (1 to 10).map(_ => ("small", 100L)) ++   // 1k tokens
      (1 to 10).map(_ => ("big", 10000L))      // 100k tokens
    ).toDF("source", "n_tokens")
    val out = Sampling.epochAllocation(df, "source", "n_tokens",
        Map("small" -> 0.5, "big" -> 0.5), budget = 100000L, maxEpochs = 4.0)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // small: target 50k over 1k tokens -> capped at 4 epochs, 46k unspent
    assert(math.abs(out("small").getAs[Double]("epochs") - 4.0) < 1e-9)
    assert(math.abs(out("small").getAs[Double]("alloc_tokens") - 4000.0) < 1e-9)
    assert(math.abs(out("small").getAs[Double]("unspent") - 46000.0) < 1e-9)
    // big: target 50k over 100k tokens -> 0.5 epochs, nothing unspent
    assert(math.abs(out("big").getAs[Double]("epochs") - 0.5) < 1e-9)
    assert(math.abs(out("big").getAs[Double]("unspent")) < 1e-9)
  }

  test("epochAllocation: weights renormalize over present sources only") {
    val df = (1 to 5).map(_ => ("a", 1000L)).toDF("source", "n_tokens")
    val out = Sampling.epochAllocation(df, "source", "n_tokens",
        Map("a" -> 0.25, "ghost" -> 0.75), budget = 1000L, maxEpochs = 10.0)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // ghost is absent from the corpus: a takes the whole budget
    assert(out.keySet == Set("a"))
    assert(math.abs(out("a").getAs[Double]("weight") - 1.0) < 1e-9)
    assert(math.abs(out("a").getAs[Double]("epochs") - 0.2) < 1e-9)
    // unmapped source present in the corpus gets weight 0
    val df2 = (df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq :+
      (("unmapped", 500L))).toDF("source", "n_tokens")
    val out2 = Sampling.epochAllocation(df2, "source", "n_tokens",
        Map("a" -> 1.0), budget = 1000L, maxEpochs = 10.0)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out2("unmapped").getAs[Double]("weight") == 0.0)
    assert(out2("unmapped").getAs[Double]("epochs") == 0.0)
  }

  test("unseenMass: singleton fraction and the Chao1 floor") {
    import graft.operators.Diversity
    // 3 singletons, 2 doubletons, 1 category of 5: N=12, V=6
    val cats = Seq("a", "b", "c") ++ Seq("d", "d", "e", "e") ++ Seq.fill(5)("f")
    val df = cats.map(c => ("g", c)).toDF("g", "c")
    val r = Diversity.unseenMass(df, Seq("g"), "c").collect().head
    assert(r.getAs[Long]("n") == 12L && r.getAs[Long]("richness") == 6L)
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n2") == 2L)
    assert(math.abs(r.getAs[Double]("missing_mass") - 0.25) < 1e-9)
    assert(math.abs(r.getAs[Double]("chao1") - (6.0 + 9.0 / 4.0)) < 1e-9)
    // exhaustively-seen corpus: no singletons, zero missing mass
    val full = (1 to 20).map(i => ("h", s"c${i % 4}")).toDF("g", "c")
    val rf = Diversity.unseenMass(full, Seq("g"), "c").collect().head
    assert(rf.getAs[Double]("missing_mass") == 0.0)
    // no doubletons: Chao1 NULL, not infinity
    val nod = Seq(("i", "x"), ("i", "y"), ("i", "z")).toDF("g", "c")
    val rn = Diversity.unseenMass(nod, Seq("g"), "c").collect().head
    assert(rn.isNullAt(rn.fieldIndex("chao1")))
  }

  test("lengthBucketBatches: similar lengths batch together, padding shrinks") {
    import graft.pipeline.Packing
    // lengths 1..64 in one shard, batches of 32: batch 0 = 1..32, 1 = 33..64
    val df = (1 to 64).map(i => ("s", i.toLong, i.toLong)).toDF("src", "id", "len")
    val out = Packing.lengthBucketBatches(df, "src", "id", "len", batchSize = 32)
      .collect().map(r => r.getAs[Long]("batch") -> r).toMap
    assert(out.size == 2)
    assert(out(0L).getAs[Long]("min_len") == 1L && out(0L).getAs[Long]("max_len") == 32L)
    assert(out(1L).getAs[Long]("min_len") == 33L && out(1L).getAs[Long]("max_len") == 64L)
    // bucketed pad: batch1 pads to 64: 1 - (sum 33..64)/(32*64)
    val pad1 = 1.0 - (33 to 64).sum.toDouble / (32.0 * 64.0)
    assert(math.abs(out(1L).getAs[Long]("sum_len") - (33 to 64).sum.toLong) < 1)
    assert(math.abs(out(1L).getAs[Double]("pad_frac") - pad1) < 1e-9)
    // a RANDOM batch spanning 1..64 would pad ~49%; bucketed batch 0 pads ~48%
    // of a far smaller max; total padded positions shrink strictly:
    val bucketedWaste = out.values.map(r =>
      r.getAs[Long]("n") * r.getAs[Long]("max_len") - r.getAs[Long]("sum_len")).sum
    val randomWaste = 64L * 64L - (1 to 64).sum
    assert(bucketedWaste < randomWaste / 2, s"$bucketedWaste vs $randomWaste")
    // batches never cross the shard key
    val two = ((1 to 40).map(i => ("a", i.toLong, 10L)) ++
      (1 to 40).map(i => ("b", i.toLong, 10L))).toDF("src", "id", "len")
    val shards = Packing.lengthBucketBatches(two, "src", "id", "len", 32)
      .select("by").distinct().count()
    assert(shards == 2)
  }

  test("softmaxWeights: sums to 1, temperature sharpens, stable at any scale") {
    import graft.operators.Stats
    val df = Seq(("g", 1L, 1.0), ("g", 2L, 2.0), ("g", 3L, 3.0)).toDF("g", "id", "s")
    val w1 = Stats.softmaxWeights(df, Seq("g"), "id", "s", temperature = 1.0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("w")).toMap
    assert(math.abs(w1.values.sum - 1.0) < 1e-6, "distribution")
    assert(w1(3L) > w1(2L) && w1(2L) > w1(1L), "monotone in score")
    // colder temperature concentrates on the max
    val wCold = Stats.softmaxWeights(df, Seq("g"), "id", "s", temperature = 0.1)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("w")).toMap
    assert(wCold(3L) > w1(3L) && wCold(3L) > 0.99)
    // max-shift: huge scores do not overflow
    val huge = Seq(("g", 1L, 1e9), ("g", 2L, 1e9 + 1)).toDF("g", "id", "s")
    val wh = Stats.softmaxWeights(huge, Seq("g"), "id", "s")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("w")).toMap
    assert(!wh.values.exists(_.isNaN) && math.abs(wh.values.sum - 1.0) < 1e-6)
    // single-row group: weight exactly 1
    val one = Seq(("h", 9L, 42.0)).toDF("g", "id", "s")
    assert(Stats.softmaxWeights(one, Seq("g"), "id", "s")
      .collect().head.getAs[Double]("w") == 1.0)
  }
}
