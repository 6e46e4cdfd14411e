package graft

import graft.meds.{ConfigPipeline, EventConfigYaml, Meds}
import graft.operators.{CodeMetadata, Extract}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The worked raw→MEDS example, end to end — the graft analog of the
  * reference's MIMIC-IV example flow (raw tables → event-config
  * conversion → shard/split → merge → metadata → preprocess), replayed
  * over the reference's OWN end-to-end extraction fixtures
  * (tests/test_extract.py via [[GoldenExtractFixtures]]) and asserted
  * against its published want-outputs:
  *
  *   1. raw CSV dumps land in a directory and resolve through
  *      [[graft.sources.AnyFormat]] (the shard_events ingest surface);
  *   2. ONE YAML document (configs/event_configs_example.yaml — the
  *      reference's EVENT_CFGS_YAML verbatim) drives every (table, event)
  *      conversion through [[EventConfigYaml]] → [[Extract.extractEvent]];
  *   3. patients split/shard via the external-splits contract;
  *   4. shards merge to the sorted MEDS cohort and finalize to the
  *      canonical schema;
  *   5. code metadata aggregates over the train split and joins the
  *      `_metadata`-extracted descriptions/parent codes;
  *   6. the preprocess [[ConfigPipeline]] runs downstream off the same
  *      frames.
  */
class RawToMedsExampleSpec extends SparkSpec {
  import GoldenExtractFixtures._

  private val TsFmt = "MM/dd/yyyy, HH:mm:ss"

  private lazy val rawDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_raw_dump")
    Seq("subjects" -> SubjectsCsv, "admit_vitals" -> AdmitVitalsCsv,
      "input_metadata" -> InputMetadataCsv, "demo_metadata" -> DemoMetadataCsv)
      .foreach { case (name, text) =>
        java.nio.file.Files.write(d.resolve(s"$name.csv"),
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    d.toString
  }

  private lazy val eventYaml: String = new String(
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("configs/event_configs_example.yaml")),
    java.nio.charset.StandardCharsets.UTF_8)

  private lazy val events = EventConfigYaml.parse(eventYaml)

  private lazy val rawTables: Map[String, DataFrame] =
    Seq("subjects", "admit_vitals")
      .map(t => t -> graft.sources.AnyFormat.read(spark, rawDir, t)).toMap

  private lazy val converted: Map[(String, String), DataFrame] =
    EventConfigYaml.convert(rawTables, events)

  /** The reference fixture's split/shard assignment (test_extract.py
    * EXPECTED_SPLITS) as an external-splits frame.
    */
  private val splits: Seq[(String, Seq[Long])] = Seq(
    "train/0" -> Seq(239684L, 1195293L),
    "train/1" -> Seq(68729L, 814703L),
    "tuning/0" -> Seq(754281L),
    "held_out/0" -> Seq(1500733L))

  private lazy val splitDf: DataFrame = {
    import spark.implicits._
    splits.flatMap { case (shard, ps) => ps.map(p => (p, shard)) }
      .toDF("patient_id", "shard")
  }

  private def wantRows(rows: Seq[(Long, String, String, java.lang.Double)]): Set[(Long, String, String, Option[Double])] =
    rows.map(r => (r._1, Option(r._2).getOrElse(""), r._3,
      Option(r._4).map(_.doubleValue()))).toSet

  private def gotRows(df: DataFrame): Set[(Long, String, String, Option[Double])] =
    df.select(col("patient_id"),
      coalesce(date_format(col("time"), TsFmt), lit("")).as("t"),
      col("code"), col("numeric_value"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet

  test("the YAML parses to the expected event definitions") {
    assert(events.size == 7)
    val byKey = events.map(d => (d.table, d.name) -> d).toMap
    assert(byKey(("subjects", "eye_color")).cfg.patientId == "MRN")
    assert(byKey(("admit_vitals", "HR")).cfg.patientId == "patient_id")
    assert(byKey(("subjects", "eye_color")).cfg.time.isEmpty)
    assert(byKey(("subjects", "dob")).cfg.timeFormat.contains(Seq("MM/dd/yyyy")))
    assert(byKey(("admit_vitals", "HR")).cfg.timeFormat.contains(Seq("MM/dd/yyyy, HH:mm:ss")))
    assert(byKey(("admit_vitals", "temp")).metadata.head.source == "input_metadata")
    assert(byKey(("subjects", "eye_color")).metadata.head.fields.map(_._1) == Seq("description"))
  }

  test("per-(shard, table) conversion matches the reference want-outputs") {
    def tableFrame(table: String): DataFrame =
      converted.collect { case ((t, _), df) if t == table => df }
        .reduce(_.unionByName(_))
    val wants: Seq[(String, String, Seq[(Long, String, String, java.lang.Double)])] = Seq(
      ("train/0", "subjects", WantTrain0Subjects),
      ("train/0", "admit_vitals", WantTrain0AdmitVitals),
      ("train/1", "subjects", WantTrain1Subjects),
      ("train/1", "admit_vitals", WantTrain1AdmitVitals),
      ("tuning/0", "subjects", WantTuning0Subjects),
      ("tuning/0", "admit_vitals", WantTuning0AdmitVitals),
      ("held_out/0", "subjects", WantHeldOut0Subjects),
      ("held_out/0", "admit_vitals", WantHeldOut0AdmitVitals))
    wants.foreach { case (shard, table, want) =>
      val ids = splits.toMap.apply(shard)
      val got = gotRows(tableFrame(table).filter(col("patient_id").isin(ids: _*)))
      assert(got == wantRows(want), s"$shard/$table:\n got $got\nwant ${wantRows(want)}")
    }
  }

  test("shards merge to one sorted cohort that finalizes to the canonical MEDS schema") {
    val cohort = Extract.mergeCohort(converted.values.toSeq)
    val finalized = Meds.finalizeData(cohort)
    val allWant =
      wantRows(WantTrain0Subjects) ++ wantRows(WantTrain0AdmitVitals) ++
        wantRows(WantTrain1Subjects) ++ wantRows(WantTrain1AdmitVitals) ++
        wantRows(WantTuning0Subjects) ++ wantRows(WantTuning0AdmitVitals) ++
        wantRows(WantHeldOut0Subjects) ++ wantRows(WantHeldOut0AdmitVitals)
    assert(finalized.count() == allWant.size)
    val sch = finalized.schema
    assert(sch("patient_id").dataType.typeName == "long")
    assert(sch("time").dataType.typeName == "timestamp")
    assert(sch("code").dataType.typeName == "string")
    assert(sch("numeric_value").dataType.typeName == "float")
    // external-splits assignment covers every patient exactly once
    val assigned = finalized.select("patient_id").distinct().join(splitDf, "patient_id")
    assert(assigned.count() == 6)
  }

  test("train-split code metadata aggregation matches the reference want frame") {
    val cohort = Extract.mergeCohort(converted.values.toSeq)
    val trainIds = splits.filter(_._1.startsWith("train/")).flatMap(_._2)
    val train = cohort.filter(col("patient_id").isin(trainIds: _*))
    val got = CodeMetadata.aggregate(
      train,
      Seq("code/n_occurrences", "code/n_patients", "values/n_occurrences",
        "values/sum", "values/sum_sqd"),
      summarizeOverAllCodes = true)
      .collect()
      .map { r =>
        val key = Option(r.get(r.fieldIndex("code"))).map(_.toString).getOrElse("")
        key -> ((
          r.getLong(r.fieldIndex("code/n_occurrences")),
          r.getLong(r.fieldIndex("code/n_patients")),
          r.getLong(r.fieldIndex("values/n_occurrences")),
          Option(r.get(r.fieldIndex("values/sum"))).map(_.toString.toDouble),
          Option(r.get(r.fieldIndex("values/sum_sqd"))).map(_.toString.toDouble)))
      }.toMap
    WantCodeMetadata.foreach { case (code, nOcc, nPat, vOcc, vSum, vSumSqd) =>
      val key = Option(code).getOrElse("")
      val (gOcc, gPat, gVOcc, gSum, gSumSqd) = got(key)
      assert(gOcc == nOcc.longValue() && gPat == nPat.longValue() && gVOcc == vOcc.longValue(),
        s"counts for '$key': got ($gOcc,$gPat,$gVOcc)")
      def close(a: Option[Double], b: java.lang.Double): Boolean = (a, Option(b)) match {
        case (None, None) => true
        // value-less codes: graft emits a 0 sum where the reference emits null
        case (Some(x), None) => x == 0.0
        case (Some(x), Some(y)) => math.abs(x - y.doubleValue()) <= 1e-6 * math.max(1.0, math.abs(y.doubleValue()))
        case _ => false
      }
      assert(close(gSum, vSum) && close(gSumSqd, vSumSqd), s"sums for '$key': got ($gSum,$gSumSqd)")
    }
  }

  test("_metadata extraction + join reproduces the described metadata want frame") {
    // explicit all-string schemas: CSV inference would read the loinc
    // code "8867-4" as a timestamp (the schema-contract path AnyFormat
    // recommends at scale anyway)
    def stringSchema(cols: String*): org.apache.spark.sql.types.StructType =
      org.apache.spark.sql.types.StructType(cols.map(c =>
        org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)))
    val metaTables = Map(
      "input_metadata" -> graft.sources.AnyFormat.read(spark, rawDir, "input_metadata",
        Some(stringSchema("lab_code", "title", "loinc"))),
      "demo_metadata" -> graft.sources.AnyFormat.read(spark, rawDir, "demo_metadata",
        Some(stringSchema("eye_color", "description"))))
    val extracted = EventConfigYaml.extractMetadata(metaTables, events)
    val cohort = Extract.mergeCohort(converted.values.toSeq)
    val trainIds = splits.filter(_._1.startsWith("train/")).flatMap(_._2)
    val agg = CodeMetadata.aggregate(
      cohort.filter(col("patient_id").isin(trainIds: _*)),
      Seq("code/n_occurrences", "code/n_patients", "values/n_occurrences",
        "values/sum", "values/sum_sqd"),
      summarizeOverAllCodes = true)
    val got = Extract.attachCodeMetadata(agg, extracted)
      .select(col("code"), col("description"),
        when(size(col("parent_codes")) > 0, concat_ws(",", col("parent_codes"))).as("pc"))
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("") ->
        (Option(r.getString(1)), Option(r.getString(2)))).toMap
    WantCodeMetadataWithDesc.foreach { case (code, _, _, _, _, _, desc, parents) =>
      val key = Option(code).getOrElse("")
      val (gDesc, gParents) = got(key)
      assert(gDesc == Option(desc), s"description for '$key': got $gDesc want ${Option(desc)}")
      assert(gParents == Option(parents), s"parent_codes for '$key': got $gParents want ${Option(parents)}")
    }
    // GREEN eyes exist only in the metadata source -> never observed -> absent
    assert(!got.contains("EYE_COLOR//GREEN"))
  }

  test("the preprocess ConfigPipeline runs downstream of the extraction") {
    val cohort = Meds.finalizeData(Extract.mergeCohort(converted.values.toSeq))
      .withColumn("numeric_value", col("numeric_value").cast("double"))
    val out = ConfigPipeline.run(cohort,
      """stages:
        |  - fit_outlier_detection
        |  - occlude_outliers
        |  - fit_normalization
        |  - fit_vocabulary_indices
        |  - normalization
        |  - tokenization
        |stage_configs:
        |  occlude_outliers:
        |    drop_is_inlier: true
        |""".stripMargin)
    assert(out.data.count() > 0)
    // codes are now vocab indices, one per distinct extracted code
    assert(out.tokenized.isDefined && out.tokenized.get.count() == 6)
  }
}
