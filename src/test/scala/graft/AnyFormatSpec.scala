package graft

import graft.sources.AnyFormat
import java.nio.file.Files
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.types._

class AnyFormatSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft_anyformat").toString

  private val csvBody = "id,name,v\n1,a,1.5\n2,b,2.5\n"

  test("reads csv with header, and csv.gz transparently") {
    val dir = tmpDir()
    Files.writeString(java.nio.file.Paths.get(s"$dir/plain.csv"), csvBody)
    val gz = new GZIPOutputStream(new java.io.FileOutputStream(s"$dir/zipped.csv.gz"))
    gz.write(csvBody.getBytes("UTF-8")); gz.close()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType), StructField("v", DoubleType)))
    for (prefix <- Seq("plain", "zipped")) {
      val df = AnyFormat.read(spark, dir, prefix, Some(schema))
      assert(df.schema == schema)
      assert(df.count() == 2)
    }
  }

  test("prefers parquet over csv when both exist") {
    val dir = tmpDir()
    import spark.implicits._
    Seq((10L, "p")).toDF("id", "name").write.parquet(s"$dir/t.parquet")
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"), "id,name\n99,c\n")
    val df = AnyFormat.read(spark, dir, "t")
    assert(df.select("id").collect().map(_.getLong(0)).toSeq == Seq(10L))
  }

  test("prefers csv.gz over csv, matching the reference's priority") {
    // extract/utils.py get_supported_fp: parquet, then csv.gz, then csv
    assert(AnyFormat.Extensions == Seq("parquet", "csv.gz", "csv"))
    val dir = tmpDir()
    val gz = new GZIPOutputStream(new java.io.FileOutputStream(s"$dir/t.csv.gz"))
    gz.write("id,name\n1,zipped\n".getBytes("UTF-8")); gz.close()
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"), "id,name\n2,plain\n")
    val df = AnyFormat.read(spark, dir, "t")
    assert(df.select("name").collect().map(_.getString(0)).toSeq == Seq("zipped"))
  }

  test("readCorpus resolves jsonl and jsonl.gz between parquet and csv") {
    val dir = tmpDir()
    val jsonBody = "{\"id\":1,\"name\":\"a\"}\n{\"id\":2,\"name\":\"b\"}\n"
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.jsonl"), jsonBody)
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"), "id,name\n9,c\n")
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val df = AnyFormat.readCorpus(spark, dir, "t", Some(schema))
    assert(df.count() == 2) // jsonl wins over csv
    val gz = new GZIPOutputStream(new java.io.FileOutputStream(s"$dir/z.jsonl.gz"))
    gz.write(jsonBody.getBytes("UTF-8")); gz.close()
    assert(AnyFormat.readCorpus(spark, dir, "z", Some(schema)).count() == 2)
  }

  test("compactFiles rewrites many small files into few, preserving rows") {
    import spark.implicits._
    val dir = tmpDir() + "/frag"
    (1L to 100L).toDF("id").repartition(20).write.parquet(dir)
    def parts = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parts >= 10)
    graft.sources.MedsIO.compactFiles(spark, dir, targetFiles = 2)
    assert(parts <= 2)
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("missing input fails loudly with the searched extensions") {
    val ex = intercept[IllegalArgumentException] {
      AnyFormat.read(spark, tmpDir(), "nope")
    }
    assert(ex.getMessage.contains("parquet") && ex.getMessage.contains("csv.gz"))
  }
}
