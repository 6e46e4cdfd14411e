package graft

import graft.ann.Pca
import graft.operators.Seasonal
import graft.text.UrlFunctions
import org.apache.spark.sql.functions._

/** Round-6 seventh batch: classical seasonal decomposition, URL
  * canonicalization, PCA embedding analysis.
  */
class Round6gOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- decompose

  private def hourlyEvents(counts: Seq[Int]) = {
    val base = 1700000000L // seconds
    counts.zipWithIndex.flatMap { case (n, h) =>
      (1 to n).map(_ => ("k", new java.sql.Timestamp((base + h * 3600L) * 1000L)))
    }.toDF("k", "ts")
  }

  test("decompose: linear series has exact linear trend, zero seasonal") {
    // v(h) = h + 30 for 72 hours: the centered MA of a line IS the line
    val df = hourlyEvents((0 until 72).map(_ + 30))
    val out = Seasonal.decompose(df, "k", "ts", period = 24)
      .orderBy("bucket").collect()
    assert(out.length == 72)
    // first and last 12 buckets: incomplete window -> NULL trend
    assert(out.take(12).forall(_.isNullAt(4)) && out.takeRight(12).forall(_.isNullAt(4)))
    val interior = out.slice(12, 60)
    interior.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getAs[Double]("trend") - (i + 12 + 30)) < 1e-9,
        s"MA of a line is the line at h=${i + 12}")
      assert(math.abs(r.getAs[Double]("seasonal")) < 1e-5, "no seasonality")
      assert(math.abs(r.getAs[Double]("residual")) < 1e-5)
    }
  }

  test("decompose: pure daily cycle lands in seasonal, identity holds") {
    // level 20 plus +8 spike at phase 0 over 4 full days
    val df = hourlyEvents((0 until 96).map(h => if (h % 24 == 0) 28 else 20))
    val out = Seasonal.decompose(df, "k", "ts", period = 24).collect()
    val byPhase = out.filter(!_.isNullAt(4)).groupBy(_.getAs[Long]("phase"))
    // phase of the spike hour carries ~ +8 * (23/24), others ~ -8/24
    val spikePhase = out.find(_.getAs[Double]("v") == 28.0).get.getAs[Long]("phase")
    byPhase.foreach { case (p, rows) =>
      val s = rows.head.getAs[Double]("seasonal")
      if (p == spikePhase) assert(s > 6.0, s"spike phase seasonal $s")
      else assert(s < 0.5, s"off-phase seasonal $s")
    }
    // exact identity v = trend + seasonal + residual where defined
    out.filter(r => !r.isNullAt(4) && !r.isNullAt(6)).foreach { r =>
      val sum = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("residual")
      assert(math.abs(r.getAs[Double]("v") - sum) < 1e-9)
    }
  }

  // ---------------------------------------------------------- canonicalize

  private def canon(url: String): Option[String] = {
    val r = Seq(url).toDF("u").select(UrlFunctions.canonicalize(col("u")).as("c"))
      .collect().head
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("canonicalize: the full gauntlet in one URL") {
    assert(canon("HTTPS://user:pw@WWW.Ex.COM:443/A/b/?utm_source=x&b=2&a=1&gclid=z#f")
      == Some("https://www.ex.com/A/b?a=1&b=2"))
  }

  test("canonicalize: ports, params, paths, degenerate inputs") {
    // default ports drop per scheme, others stay
    assert(canon("http://a.com:80/x") == Some("http://a.com/x"))
    assert(canon("http://a.com:443/x") == Some("http://a.com:443/x"))
    assert(canon("https://a.com:8443/x") == Some("https://a.com:8443/x"))
    // root slash strips, query-only survives sorted, empty query vanishes
    assert(canon("https://a.com/") == Some("https://a.com"))
    assert(canon("https://a.com/?z=1&y=2") == Some("https://a.com?y=2&z=1"))
    assert(canon("https://a.com/p?utm_campaign=x&utm_medium=y") == Some("https://a.com/p"))
    // ref & friends are name-anchored: "reference=1" is NOT tracking
    assert(canon("https://a.com/p?ref=x&reference=1") == Some("https://a.com/p?reference=1"))
    // path case preserved; host case folded; fragment dropped
    assert(canon("HTTP://A.com/CaSe#frag") == Some("http://a.com/CaSe"))
    // no scheme -> NULL, not garbage
    assert(canon("not a url").isEmpty && canon("www.a.com/x").isEmpty)
  }

  test("canonicalize: a '#' before the only '?' keeps fragment content dead") {
    // the query is the part after the first '?' BEFORE any '#'; a
    // fragment like '#sec?x=1' must not resurrect 'x=1' as a param
    assert(canon("http://h.com/p#sec?x=1") == Some("http://h.com/p"))
    assert(canon("http://h.com/p?a=1#sec?x=9") == Some("http://h.com/p?a=1"))
  }

  // ------------------------------------------------------------------- pca

  private val pcaData = {
    // dominant direction u = (0.6, 0.8, 0, 0), minor orthogonal noise
    val u = Seq(0.6, 0.8, 0.0, 0.0)
    val w = Seq(0.0, 0.0, 1.0, 0.0)
    (1 to 200).map { i =>
      val a = (i % 21) - 10.0          // spread -10..10 along u
      val b = ((i * 7) % 5 - 2.0) / 10 // small spread along w
      (i.toLong, u.zip(w).map { case (ui, wi) => (a * ui + b * wi).toFloat })
    }.toDF("vec_id", "embedding")
  }

  test("pca: recovers the dominant direction with orthonormal basis") {
    val m = Pca.fit(pcaData, k = 2)
    assert(m.explained.head > 0.9, s"dominant axis explains ${m.explained}")
    val c0 = m.components(0)
    assert(math.abs(math.abs(c0(0) * 0.6 + c0(1) * 0.8) - 1.0) < 1e-3,
      s"first component aligns with u: $c0")
    // orthonormal: unit norms, zero dot
    m.components.foreach { c =>
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9)
    }
    val dot = m.components(0).zip(m.components(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-9)
    // sign fix: largest-|weight| coordinate is positive
    m.components.foreach(c => assert(c.maxBy(math.abs) >= 0))
  }

  test("pca: projection variance ordering and whitening") {
    val m = Pca.fit(pcaData, k = 2)
    val proj = Pca.project(pcaData, m).collect()
      .map(r => r.getSeq[Double](r.fieldIndex("proj")))
    def variance(xs: Seq[Double]): Double = {
      val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / (xs.size - 1)
    }
    val v0 = variance(proj.map(_(0)).toSeq)
    val v1 = variance(proj.map(_(1)).toSeq)
    assert(v0 > v1, "variance-descending components")
    assert(math.abs(v0 - m.eigenvalues(0)) / v0 < 1e-6,
      "projection variance equals the eigenvalue")
    val white = Pca.project(pcaData, m, whiten = true).collect()
      .map(r => r.getSeq[Double](r.fieldIndex("proj")))
    assert(math.abs(variance(white.map(_(0)).toSeq) - 1.0) < 1e-6)
    assert(math.abs(variance(white.map(_(1)).toSeq) - 1.0) < 1e-6)
  }

  test("pca: full-rank projection reconstructs the input") {
    val m = Pca.fit(pcaData, k = 4)
    val orig = pcaData.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](r.fieldIndex("embedding"))).toMap
    Pca.project(pcaData, m, whiten = false).collect().foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val p = r.getSeq[Double](r.fieldIndex("proj"))
      val rec = (0 until 4).map { d =>
        m.mean(d) + m.components.indices.map(c => p(c) * m.components(c)(d)).sum
      }
      rec.zip(orig(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-5, s"reconstruction at id=$id")
      }
    }
  }
}
