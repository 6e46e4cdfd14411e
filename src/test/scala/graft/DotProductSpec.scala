package graft

import graft.functions.{GraftFunctions, GraftExtensions}
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = (1L to 50L).map { i =>
    (i, Array.tabulate(64)(d => ((i * 31 + d * 7) % 13 - 6) / 3.0f))
  }.toDF("id", "v")

  test("native dot product is bit-identical to the composable HOF form") {
    val hof = aggregate(
      zip_with(col("a.v"), col("b.v"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val both = vecs.as("a").join(vecs.as("b"), col("a.id") <= col("b.id"))
      .select(GraftFunctions.dotProduct(col("a.v"), col("b.v")).as("native"), hof.as("hof"))
    // bit-exact: no tolerance
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.filter(col("native").isNull).count() == 0)
  }

  test("native sqdist is bit-identical to the composable HOF form") {
    val hof = aggregate(
      zip_with(col("a.v"), col("b.v"), (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0), (acc, x) => acc + x)
    val both = vecs.as("a").join(vecs.as("b"), col("a.id") <= col("b.id"))
      .select(GraftFunctions.sqDist(col("a.v"), col("b.v")).as("native"), hof.as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.filter(col("native").isNull).count() == 0)
  }

  test("sqdist null semantics match dot (length mismatch, null element, null array)") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    assert(df.select(GraftFunctions.sqDist(col("a"), col("b"))).collect()(0).isNullAt(0))
    val withNullElem = spark.sql("SELECT array(1.0D, NULL) AS a, array(1.0D, 2.0D) AS b")
    assert(withNullElem.select(GraftFunctions.sqDist(col("a"), col("b"))).collect()(0).isNullAt(0))
    assert(spark.sql("SELECT array(CAST(1 AS FLOAT)) a, array(3.0D) b")
      .select(GraftFunctions.sqDist(col("a"), col("b"))).as[Double].head() == 4.0)
  }

  test("null semantics: length mismatch and null elements yield null") {
    val df = Seq(
      (Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f)) // length mismatch
    ).toDF("a", "b")
    assert(df.select(GraftFunctions.dotProduct(col("a"), col("b"))).collect()(0).isNullAt(0))
    val withNullElem = spark.sql("SELECT array(1.0D, NULL) AS a, array(1.0D, 2.0D) AS b")
    assert(withNullElem.select(GraftFunctions.dotProduct(col("a"), col("b"))).collect()(0).isNullAt(0))
    val nullArr = spark.sql("SELECT CAST(NULL AS array<double>) AS a, array(1.0D) AS b")
    assert(nullArr.select(GraftFunctions.dotProduct(col("a"), col("b"))).collect()(0).isNullAt(0))
  }

  test("mixed float/double element types work") {
    val df = spark.sql("SELECT array(CAST(0.5 AS FLOAT), CAST(2.0 AS FLOAT)) AS f, array(2.0D, 3.0D) AS d")
    assert(df.select(GraftFunctions.dotProduct(col("f"), col("d"))).as[Double].head() == 7.0)
  }

  test("GraftExtensions registers graft_dot for SQL") {
    // getOrCreate only applies extensions when instantiating a new
    // SparkSession: clear the cached sessions (keeping the context) so the
    // builder constructs one with the extension installed.
    val prev = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val withExt = org.apache.spark.sql.SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = withExt.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(r == 11.0)
      val rh = withExt.sql("SELECT graft_rolling_hash('abc') AS h, graft_rolling_hash('abc', 31, 1000000007) AS h2")
        .collect()(0)
      assert(rh.getLong(0) == rh.getLong(1))
      val sh = withExt.sql(
        "SELECT graft_shingle_hashes(array('a','b','c'), 2) AS hs, graft_sqdist(array(1.0D), array(3.0D)) AS d2")
        .collect()(0)
      assert(sh.getSeq[Long](0).length == 2 && sh.getDouble(1) == 4.0)
      val topk = withExt.sql(
        """SELECT graft_top_k(CAST(s AS DOUBLE), CAST(i AS BIGINT), 2) AS t
          |FROM VALUES (1.0, 1), (3.0, 2), (2.0, 3) AS v(s, i)""".stripMargin)
        .selectExpr("transform(t, x -> x.id) AS ids").collect()(0).getSeq[Long](0)
      assert(topk == Seq(2L, 3L))
      val vs = withExt.sql(
        """SELECT graft_vector_sum(v) AS s
          |FROM VALUES (array(1.0D, 2.0D)), (array(3.0D, 4.0D)) AS t(v)""".stripMargin)
        .collect()(0).getSeq[Double](0)
      assert(vs == Seq(4.0, 6.0))
      val un = withExt.sql(
        "SELECT graft_unicode_normalize('ﬁle', 'NFKC', 'true') AS n, graft_unicode_normalize('ABC') AS p")
        .collect()(0)
      assert(un.getString(0) == "file" && un.getString(1) == "ABC")
      val fi = withExt.sql(
        """SELECT graft_frequent_items(x, 2) AS c
          |FROM VALUES ('a'), ('a'), ('a'), ('b'), ('b'), ('c') AS t(x)""".stripMargin)
        .selectExpr("transform(c, i -> i.item) AS items").collect()(0).getSeq[String](0)
      assert(fi.contains("a"))
      val jwv = withExt.sql("SELECT graft_jaro_winkler('martha', 'marhta') AS s")
        .collect()(0).getDouble(0)
      assert(math.abs(jwv - 0.9611111111111111) < 1e-12)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(prev)
      org.apache.spark.sql.SparkSession.setActiveSession(prev)
    }
  }
}
