package graft

import graft.sources.MedsIO
import graft.operators.Shard
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MedsIOSpec extends SparkSpec {
  import spark.implicits._

  test("sharded write/read round-trips with partition pruning on split") {
    val cohort = (1L to 40L).flatMap { p =>
      Seq((p, java.sql.Timestamp.valueOf(f"2020-01-${p % 27 + 1}%02d 10:00:00"), "HR", p * 1.0))
    }.toDF("patient_id", "time", "code", "numeric_value")
    val assign = Shard.splitByModulo(cohort, Seq("train" -> 8, "tuning" -> 1, "held_out" -> 1), 2)
    val dir = Files.createTempDirectory("meds_io").toString

    MedsIO.writeSharded(cohort, assign, dir)
    val back = MedsIO.readSharded(spark, dir)
    assert(back.count() == 40)
    assert(back.columns.toSet == Set("patient_id", "time", "code", "numeric_value", "split", "shard"))

    // whole patients land in one (split, shard)
    val spread = back.groupBy("patient_id")
      .agg(countDistinct(col("split"), col("shard")).as("n"))
      .filter(col("n") > 1).count()
    assert(spread == 0)

    // split filter prunes to train partitions only and matches the assignment
    val train = back.filter(col("split") === "train")
    val expectTrain = assign.filter(col("split") === "train").count()
    assert(train.select("patient_id").distinct().count() == expectTrain)
    val pruned = train.queryExecution.executedPlan.toString
    assert(pruned.contains("split") ) // partition column participates in planning
  }

  test("writeMetadata emits codes.parquet, dataset.json, and patient_splits.parquet") {
    val codeMeta = Seq(("HR", "Heart rate", "vitals"), ("BP", "Blood pressure", "vitals"))
      .toDF("code", "description", "parent_codes") // scalar parent -> wrapped in list
    val cohort = (1L to 20L).toDF("patient_id")
    val splits = Shard.splitByModulo(cohort, Seq("train" -> 8, "tuning" -> 1, "held_out" -> 1), 2)
    val dir = Files.createTempDirectory("meds_meta").toString

    MedsIO.writeMetadata(codeMeta, splits, MedsIO.DatasetInfo("unit-test", "1.0"), dir)

    // the MEDS contract: codes.parquet is a literal single FILE (strict
    // readers open the path directly), not a Spark part-file directory
    val codesFile = new java.io.File(s"$dir/metadata/codes.parquet")
    assert(codesFile.isFile, s"codes.parquet should be a regular file, found ${codesFile.isDirectory}")
    val codes = spark.read.parquet(s"$dir/metadata/codes.parquet")
    assert(codes.count() == 2)
    assert(codes.schema("parent_codes").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))

    val back = spark.read.parquet(s"$dir/metadata/patient_splits.parquet")
    assert(back.columns.toSeq == Seq("patient_id", "split"))
    assert(back.count() == 20)

    val json = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/metadata/dataset.json")), "UTF-8")
    Seq("dataset_name", "dataset_version", "etl_name", "etl_version", "meds_version")
      .foreach(k => assert(json.contains(s""""$k""""), s"missing key $k in $json"))
    assert(json.contains(""""dataset_name": "unit-test""""))
  }

  test("writeRowChunked bounds file row counts with no extra scan or shuffle") {
    val df = (1L to 100L).map(i => (i, s"row$i")).toDF("id", "payload").coalesce(1)
    val dir = Files.createTempDirectory("row_chunked").toString
    MedsIO.writeRowChunked(df, dir, rowsPerShard = 30)

    val back = spark.read.parquet(dir)
    assert(back.count() == 100)
    // 100 rows in one write task at <=30 rows/file -> 4 files
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, s"expected 4 chunk files, got ${files.length}")
    files.foreach { f =>
      assert(spark.read.parquet(f.getPath).count() <= 30)
    }
    // the chunking is a writer option: the plan may not contain a count or
    // a repartition exchange (the anti-pattern this replaces)
    val plan = df.queryExecution.sparkPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
