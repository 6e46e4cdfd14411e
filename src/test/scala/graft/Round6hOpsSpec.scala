package graft

import graft.operators.{FuzzyJoin, Stats}
import org.apache.spark.sql.functions._

/** Round-6 eighth batch: 1-D earth-mover drift, Fellegi–Sunter weights. */
class Round6hOpsSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------------- emd1d

  test("emd1d: identical halves score 0; shifted mass scores the distance") {
    // pair construction: ids (2k-1, 2k) share a value, so the even/odd
    // halves carry identical multisets
    val same = (1 to 40).map(i => ("g", i.toLong, ((i + 1) / 2 % 10).toDouble))
    val r0 = Stats.emd1d(same.toDF("g", "id", "x"), Seq("g"), "x",
      isRef = col("id") % 2 === 0, nBins = 10).collect().head
    assert(r0.getAs[Long]("n_ref") == 20L && r0.getAs[Long]("n_cur") == 20L)
    assert(math.abs(r0.getAs[Double]("emd")) < 1e-9, "same distribution, zero distance")
    // ref at 0, cur at 10, 2 bins: |cum| = 1 on the first bin, width 5
    val shift = (1 to 10).map(i => ("g", i.toLong, if (i % 2 == 0) 0.0 else 10.0))
    val r1 = Stats.emd1d(shift.toDF("g", "id", "x"), Seq("g"), "x",
      isRef = col("id") % 2 === 0, nBins = 2).collect().head
    assert(math.abs(r1.getAs[Double]("emd") - 5.0) < 1e-9,
      "one bin of mass moved across one 5-wide bin")
  }

  test("emd1d: missing side is NULL, constant group is 0") {
    val oneSide = (1 to 10).map(i => ("g", i.toLong, i.toDouble))
    val r = Stats.emd1d(oneSide.toDF("g", "id", "x"), Seq("g"), "x",
      isRef = lit(true), nBins = 4).collect().head
    assert(r.isNullAt(r.fieldIndex("n_cur")) && r.isNullAt(r.fieldIndex("emd")))
    val const = (1 to 10).map(i => ("g", i.toLong, 7.0))
    val rc = Stats.emd1d(const.toDF("g", "id", "x"), Seq("g"), "x",
      isRef = col("id") % 2 === 0, nBins = 4).collect().head
    assert(rc.getAs[Double]("emd") == 0.0, "no range, no movement")
  }

  test("emd1d: farther moves cost more than near moves") {
    def emdOf(curVal: Double): Double = {
      val rows = (1 to 10).map(i => ("g", i.toLong, if (i % 2 == 0) 0.0 else curVal)) :+
        (("g", 11L, 10.0)) // pin the range to [0, 10] on the ref side
      Stats.emd1d(rows.toDF("g", "id", "x"), Seq("g"), "x",
        isRef = col("id") % 2 === 0 || col("id") === 11L, nBins = 10)
        .collect().head.getAs[Double]("emd")
    }
    assert(emdOf(9.0) > emdOf(3.0), "mass moved farther costs more")
  }

  // --------------------------------------------------------- fellegiSunter

  private val fsRecords = Seq(
    (1L, "ny", 10L), (2L, "ny", 10L), (3L, "ny", 20L), (4L, "sf", null.asInstanceOf[Any])
  ).map { case (i, c, b) => (i, c, if (b == null) None else Some(b.asInstanceOf[Long])) }
    .toDF("id", "city", "bucket")

  test("fellegiSunter: rare-field agreement outweighs common-field agreement") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = FuzzyJoin.fellegiSunter(fsRecords, "id", pairs, Seq("city", "bucket"))
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r).toMap
    // u_city = (3^2 + 1^2)/16 = 0.625; u_bucket over 3 non-null = (4+1)/16
    val uc = 10.0 / 16.0
    val ub = 5.0 / 16.0
    def w(agree: Boolean, u: Double): Double =
      if (agree) math.log(0.9 / u) / math.log(2.0)
      else math.log((1.0 - 0.9) / (1.0 - u)) / math.log(2.0)
    // (1,2): both agree
    val r12 = out((1L, 2L))
    assert(r12.getAs[Long]("n_agree") == 2L)
    assert(math.abs(r12.getAs[Double]("weight") - (w(true, uc) + w(true, ub))) < 1e-12)
    // (1,3): city agrees, bucket disagrees
    val r13 = out((1L, 3L))
    assert(r13.getAs[Long]("n_agree") == 1L)
    assert(math.abs(r13.getAs[Double]("weight") - (w(true, uc) + w(false, ub))) < 1e-12)
    // (1,4): city disagrees, bucket NULL on one side -> neutral 0
    val r14 = out((1L, 4L))
    assert(r14.getAs[Long]("n_agree") == 0L)
    assert(math.abs(r14.getAs[Double]("weight") - w(false, uc)) < 1e-12)
    // the rare bucket agreement is worth more than the common city one
    assert(w(true, ub) > w(true, uc))
  }

  test("fellegiSunter: degenerate inputs are rejected") {
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] {
      FuzzyJoin.fellegiSunter(fsRecords, "id", pairs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      FuzzyJoin.fellegiSunter(fsRecords, "id", pairs, Seq("city"), m = 1.0)
    }
  }
}
