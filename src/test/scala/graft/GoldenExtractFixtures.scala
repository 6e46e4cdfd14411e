package graft

/** The reference's end-to-end extraction fixtures
  * (/root/reference/tests/test_extract.py): raw CSV inputs, and the
  * expected MEDS sub-sharded outputs and aggregated code metadata.
  * Machine-extracted to avoid transcription drift. The event-config YAML
  * itself is checked in as configs/event_configs_example.yaml.
  */
object GoldenExtractFixtures {
  private def jd(d: Double): java.lang.Double = java.lang.Double.valueOf(d)
  private def jl(l: Long): java.lang.Long = java.lang.Long.valueOf(l)

  val SubjectsCsv: String =
"""MRN,dob,eye_color,height
1195293,06/20/1978,BLUE,164.6868838269085
239684,12/28/1980,BROWN,175.271115221764
1500733,07/20/1986,BROWN,158.60131573580904
814703,03/28/1976,HAZEL,156.48559093209357
754281,12/19/1988,BROWN,166.22261567137025
68729,03/09/1978,HAZEL,160.3953106166676
""".stripMargin

  val AdmitVitalsCsv: String =
"""patient_id,admit_date,disch_date,department,vitals_date,HR,temp
239684,"05/11/2010, 17:41:51","05/11/2010, 19:27:19",CARDIAC,"05/11/2010, 18:57:18",112.6,95.5
754281,"01/03/2010, 06:27:59","01/03/2010, 08:22:13",PULMONARY,"01/03/2010, 06:27:59",142.0,99.8
814703,"02/05/2010, 05:55:39","02/05/2010, 07:02:30",ORTHOPEDIC,"02/05/2010, 05:55:39",170.2,100.1
239684,"05/11/2010, 17:41:51","05/11/2010, 19:27:19",CARDIAC,"05/11/2010, 18:25:35",113.4,95.8
68729,"05/26/2010, 02:30:56","05/26/2010, 04:51:52",PULMONARY,"05/26/2010, 02:30:56",86.0,97.8
1195293,"06/20/2010, 19:23:52","06/20/2010, 20:50:04",CARDIAC,"06/20/2010, 20:12:31",112.5,99.8
1500733,"06/03/2010, 14:54:38","06/03/2010, 16:44:26",ORTHOPEDIC,"06/03/2010, 16:20:49",90.1,100.1
239684,"05/11/2010, 17:41:51","05/11/2010, 19:27:19",CARDIAC,"05/11/2010, 17:48:48",105.1,96.2
239684,"05/11/2010, 17:41:51","05/11/2010, 19:27:19",CARDIAC,"05/11/2010, 17:41:51",102.6,96.0
1195293,"06/20/2010, 19:23:52","06/20/2010, 20:50:04",CARDIAC,"06/20/2010, 19:25:32",114.1,100.0
1500733,"06/03/2010, 14:54:38","06/03/2010, 16:44:26",ORTHOPEDIC,"06/03/2010, 14:54:38",91.4,100.0
1195293,"06/20/2010, 19:23:52","06/20/2010, 20:50:04",CARDIAC,"06/20/2010, 20:41:33",107.5,100.4
1195293,"06/20/2010, 19:23:52","06/20/2010, 20:50:04",CARDIAC,"06/20/2010, 20:24:44",107.7,100.0
1195293,"06/20/2010, 19:23:52","06/20/2010, 20:50:04",CARDIAC,"06/20/2010, 19:45:19",119.8,99.9
1195293,"06/20/2010, 19:23:52","06/20/2010, 20:50:04",CARDIAC,"06/20/2010, 19:23:52",109.0,100.0
1500733,"06/03/2010, 14:54:38","06/03/2010, 16:44:26",ORTHOPEDIC,"06/03/2010, 15:39:49",84.4,100.3
""".stripMargin

  val InputMetadataCsv: String =
"""lab_code,title,loinc
HR,Heart Rate,8867-4
temp,Body Temperature,8310-5
""".stripMargin

  val DemoMetadataCsv: String =
"""eye_color,description
BROWN,"Brown Eyes. The most common eye color."
BLUE,"Blue Eyes. Less common than brown."
HAZEL,"Hazel eyes. These are uncommon"
GREEN,"Green eyes. These are rare."
""".stripMargin

  val WantTrain0Subjects = Seq(
    (239684L, null, "EYE_COLOR//BROWN", null),
    (239684L, null, "HEIGHT", jd(175.271115221764)),
    (239684L, "12/28/1980, 00:00:00", "DOB", null),
    (1195293L, null, "EYE_COLOR//BLUE", null),
    (1195293L, null, "HEIGHT", jd(164.6868838269085)),
    (1195293L, "06/20/1978, 00:00:00", "DOB", null))

  val WantTrain0AdmitVitals = Seq(
    (239684L, "05/11/2010, 17:41:51", "ADMISSION//CARDIAC", null),
    (239684L, "05/11/2010, 17:41:51", "HR", jd(102.6)),
    (239684L, "05/11/2010, 17:41:51", "TEMP", jd(96.0)),
    (239684L, "05/11/2010, 17:48:48", "HR", jd(105.1)),
    (239684L, "05/11/2010, 17:48:48", "TEMP", jd(96.2)),
    (239684L, "05/11/2010, 18:25:35", "HR", jd(113.4)),
    (239684L, "05/11/2010, 18:25:35", "TEMP", jd(95.8)),
    (239684L, "05/11/2010, 18:57:18", "HR", jd(112.6)),
    (239684L, "05/11/2010, 18:57:18", "TEMP", jd(95.5)),
    (239684L, "05/11/2010, 19:27:19", "DISCHARGE", null),
    (1195293L, "06/20/2010, 19:23:52", "ADMISSION//CARDIAC", null),
    (1195293L, "06/20/2010, 19:23:52", "HR", jd(109.0)),
    (1195293L, "06/20/2010, 19:23:52", "TEMP", jd(100.0)),
    (1195293L, "06/20/2010, 19:25:32", "HR", jd(114.1)),
    (1195293L, "06/20/2010, 19:25:32", "TEMP", jd(100.0)),
    (1195293L, "06/20/2010, 19:45:19", "HR", jd(119.8)),
    (1195293L, "06/20/2010, 19:45:19", "TEMP", jd(99.9)),
    (1195293L, "06/20/2010, 20:12:31", "HR", jd(112.5)),
    (1195293L, "06/20/2010, 20:12:31", "TEMP", jd(99.8)),
    (1195293L, "06/20/2010, 20:24:44", "HR", jd(107.7)),
    (1195293L, "06/20/2010, 20:24:44", "TEMP", jd(100.0)),
    (1195293L, "06/20/2010, 20:41:33", "HR", jd(107.5)),
    (1195293L, "06/20/2010, 20:41:33", "TEMP", jd(100.4)),
    (1195293L, "06/20/2010, 20:50:04", "DISCHARGE", null))

  val WantTrain1Subjects = Seq(
    (68729L, null, "EYE_COLOR//HAZEL", null),
    (68729L, null, "HEIGHT", jd(160.3953106166676)),
    (68729L, "03/09/1978, 00:00:00", "DOB", null),
    (814703L, null, "EYE_COLOR//HAZEL", null),
    (814703L, null, "HEIGHT", jd(156.48559093209357)),
    (814703L, "03/28/1976, 00:00:00", "DOB", null))

  val WantTrain1AdmitVitals = Seq(
    (68729L, "05/26/2010, 02:30:56", "ADMISSION//PULMONARY", null),
    (68729L, "05/26/2010, 02:30:56", "HR", jd(86.0)),
    (68729L, "05/26/2010, 02:30:56", "TEMP", jd(97.8)),
    (68729L, "05/26/2010, 04:51:52", "DISCHARGE", null),
    (814703L, "02/05/2010, 05:55:39", "ADMISSION//ORTHOPEDIC", null),
    (814703L, "02/05/2010, 05:55:39", "HR", jd(170.2)),
    (814703L, "02/05/2010, 05:55:39", "TEMP", jd(100.1)),
    (814703L, "02/05/2010, 07:02:30", "DISCHARGE", null))

  val WantTuning0Subjects = Seq(
    (754281L, null, "EYE_COLOR//BROWN", null),
    (754281L, null, "HEIGHT", jd(166.22261567137025)),
    (754281L, "12/19/1988, 00:00:00", "DOB", null))

  val WantTuning0AdmitVitals = Seq(
    (754281L, "01/03/2010, 06:27:59", "ADMISSION//PULMONARY", null),
    (754281L, "01/03/2010, 06:27:59", "HR", jd(142.0)),
    (754281L, "01/03/2010, 06:27:59", "TEMP", jd(99.8)),
    (754281L, "01/03/2010, 08:22:13", "DISCHARGE", null))

  val WantHeldOut0Subjects = Seq(
    (1500733L, null, "EYE_COLOR//BROWN", null),
    (1500733L, null, "HEIGHT", jd(158.60131573580904)),
    (1500733L, "07/20/1986, 00:00:00", "DOB", null))

  val WantHeldOut0AdmitVitals = Seq(
    (1500733L, "06/03/2010, 14:54:38", "ADMISSION//ORTHOPEDIC", null),
    (1500733L, "06/03/2010, 14:54:38", "HR", jd(91.4)),
    (1500733L, "06/03/2010, 14:54:38", "TEMP", jd(100.0)),
    (1500733L, "06/03/2010, 15:39:49", "HR", jd(84.4)),
    (1500733L, "06/03/2010, 15:39:49", "TEMP", jd(100.3)),
    (1500733L, "06/03/2010, 16:20:49", "HR", jd(90.1)),
    (1500733L, "06/03/2010, 16:20:49", "TEMP", jd(100.1)),
    (1500733L, "06/03/2010, 16:44:26", "DISCHARGE", null))

  val WantCodeMetadata = Seq(
    (null, jl(44), jl(4), jl(28), jd(3198.8389005974336), jd(382968.28937288234)),
    ("ADMISSION//CARDIAC", jl(2), jl(2), jl(0), null, null),
    ("ADMISSION//ORTHOPEDIC", jl(1), jl(1), jl(0), null, null),
    ("ADMISSION//PULMONARY", jl(1), jl(1), jl(0), null, null),
    ("DISCHARGE", jl(4), jl(4), jl(0), null, null),
    ("DOB", jl(4), jl(4), jl(0), null, null),
    ("EYE_COLOR//BLUE", jl(1), jl(1), jl(0), null, null),
    ("EYE_COLOR//BROWN", jl(1), jl(1), jl(0), null, null),
    ("EYE_COLOR//HAZEL", jl(2), jl(2), jl(0), null, null),
    ("HEIGHT", jl(4), jl(4), jl(4), jd(656.8389005974336), jd(108056.12937288235)),
    ("HR", jl(12), jl(4), jl(12), jd(1360.5000000000002), jd(158538.77)),
    ("TEMP", jl(12), jl(4), jl(12), jd(1181.4999999999998), jd(116373.38999999998)))

  val WantCodeMetadataWithDesc = Seq(
    (null, jl(44), jl(4), jl(28), jd(3198.8389005974336), jd(382968.28937288234), null, null),
    ("ADMISSION//CARDIAC", jl(2), jl(2), jl(0), null, null, null, null),
    ("ADMISSION//ORTHOPEDIC", jl(1), jl(1), jl(0), null, null, null, null),
    ("ADMISSION//PULMONARY", jl(1), jl(1), jl(0), null, null, null, null),
    ("DISCHARGE", jl(4), jl(4), jl(0), null, null, null, null),
    ("DOB", jl(4), jl(4), jl(0), null, null, null, null),
    ("EYE_COLOR//BLUE", jl(1), jl(1), jl(0), null, null, "Blue Eyes. Less common than brown.", null),
    ("EYE_COLOR//BROWN", jl(1), jl(1), jl(0), null, null, "Brown Eyes. The most common eye color.", null),
    ("EYE_COLOR//HAZEL", jl(2), jl(2), jl(0), null, null, "Hazel eyes. These are uncommon", null),
    ("HEIGHT", jl(4), jl(4), jl(4), jd(656.8389005974336), jd(108056.12937288235), null, null),
    ("HR", jl(12), jl(4), jl(12), jd(1360.5000000000002), jd(158538.77), "Heart Rate", "LOINC/8867-4"),
    ("TEMP", jl(12), jl(4), jl(12), jd(1181.4999999999998), jd(116373.38999999998), "Body Temperature", "LOINC/8310-5"))

}
