package graft.meds

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import graft.operators.{EventParser, Extract}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** YAML front-end for raw→MEDS event conversion — parses the reference's
  * `event_configs.yaml` document shape (reference:
  * extract/convert_to_sharded_events.py:33-101 for the block grammar;
  * MIMIC-IV_Example/configs/event_configs.yaml and
  * tests/test_extract.py:EVENT_CFGS_YAML for worked instances) into
  * [[graft.operators.Extract.EventConfig]]s plus `_metadata` extraction
  * specs compiled to the [[graft.operators.EventParser]] expression ADT.
  *
  * Document shape:
  * {{{
  * patient_id_col: MRN          # optional global default
  * <table name>:
  *   patient_id_col: subject_id # optional per-table override
  *   <event name>:
  *     code: [LITERAL, "col(code_col)", ...]   # or a single scalar
  *     time: null | "col(ts_col)"              # null => static event
  *     time_format: "%m/%d/%Y" | [fmt, ...]    # C strptime, tried in order
  *     numeric_value: <col>  text_value: <col>  categorical_value: <col>
  *     <out_col>: <in_col>                     # extra passthrough columns
  *     _metadata:
  *       <metadata table>:
  *         <out col>: <parser-DSL fragment>    # see EventParser
  * }}}
  */
object EventConfigYaml {

  private val mapper = new ObjectMapper(new YAMLFactory())

  /** One `_metadata` block: extract `fields` from metadata table `source`,
    * keyed by the owning event's literal/column code parts.
    */
  final case class MetadataSpec(source: String, fields: Seq[(String, EventParser.ColExpr)])

  final case class EventDef(
      table: String,
      name: String,
      cfg: Extract.EventConfig,
      metadata: Seq[MetadataSpec]
  )

  /** C-strptime → java.time DateTimeFormatter pattern (the reference's
    * `time_format` values are Polars strptime directives,
    * convert_to_sharded_events.py:28-31).
    */
  def strptimeToSpark(fmt: String): String = {
    val directive = Map(
      'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
      'H' -> "HH", 'M' -> "mm", 'S' -> "ss", 'f' -> "SSSSSS",
      'j' -> "DDD", 'e' -> "d", '%' -> "%")
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        val d = fmt.charAt(i + 1)
        out ++= directive.getOrElse(d,
          throw new IllegalArgumentException(s"unsupported strptime directive %$d in '$fmt'"))
        i += 2
      } else {
        val c = fmt.charAt(i)
        require(!c.isLetter, s"bare letter '$c' in time format '$fmt' is ambiguous; use a %-directive")
        out += c
        i += 1
      }
    }
    out.result()
  }

  private val ColRef = "^col\\((.+)\\)$".r

  /** A parser-DSL fragment (reference: extract/parser.py cfg_to_expr) —
    * plain string = column, `col(x)` = column, `{…}`-interpolated string =
    * template, `{literal: v}`, `{str:/col: …}`, `{output-template:
    * matcher}`, `{matcher: …, output: …}`, list = first-valid coalesce.
    */
  def toColExpr(n: JsonNode): EventParser.ColExpr =
    if (n.isTextual) {
      n.asText() match {
        case ColRef(c)                   => EventParser.Col(c)
        case s if s.contains("{")        => EventParser.Str(s)
        case s                           => EventParser.Col(s)
      }
    } else if (n.isArray) {
      EventParser.FirstValid(n.elements().asScala.map(toColExpr).toSeq)
    } else if (n.isObject) {
      val fields = n.properties().asScala.map(e => e.getKey -> e.getValue).toSeq
      fields match {
        case Seq(("literal", v))         => EventParser.Literal(scalar(v))
        case Seq(("str", v))             => EventParser.Str(v.asText())
        case Seq(("col", v))             => EventParser.Col(v.asText())
        case _ if n.has("matcher") && n.has("output") =>
          EventParser.Guarded(matcherMap(n.get("matcher")), toColExpr(n.get("output")))
        case Seq((template, matcher)) if matcher.isObject =>
          val out =
            if (template.contains("{")) EventParser.Str(template) else EventParser.Col(template)
          EventParser.Guarded(matcherMap(matcher), out)
        case _ =>
          throw new IllegalArgumentException(s"unparseable metadata expression: $n")
      }
    } else throw new IllegalArgumentException(s"unparseable metadata expression: $n")

  private def scalar(v: JsonNode): Any =
    if (v.isIntegralNumber) v.asLong()
    else if (v.isNumber) v.asDouble()
    else if (v.isBoolean) v.asBoolean()
    else v.asText()

  private def matcherMap(n: JsonNode): Map[String, Any] =
    n.properties().asScala.map(e => e.getKey -> scalar(e.getValue)).toMap

  private def codeParts(n: JsonNode): Seq[Extract.CodePart] = {
    val nodes = if (n.isArray) n.elements().asScala.toSeq else Seq(n)
    nodes.map(_.asText() match {
      case ColRef(c) => Extract.CodeCol(c)
      case s         => Extract.CodeLit(s)
    })
  }

  private val ReservedKeys =
    Set("code", "time", "time_format", "numeric_value", "text_value",
      "categorical_value", "_metadata", "patient_id_col")

  /** Parse the full document into per-(table, event) definitions. */
  def parse(yamlText: String, defaultPatientIdCol: String = "patient_id"): Seq[EventDef] = {
    val root = mapper.readTree(yamlText)
    val globalPid = Option(root.get("patient_id_col")).map(_.asText()).getOrElse(defaultPatientIdCol)
    root.properties().asScala.toSeq
      .filterNot(_.getKey == "patient_id_col")
      .flatMap { tableEntry =>
        val (table, tNode) = (tableEntry.getKey, tableEntry.getValue)
        val pid = Option(tNode.get("patient_id_col")).map(_.asText()).getOrElse(globalPid)
        tNode.properties().asScala.toSeq
          .filterNot(_.getKey == "patient_id_col")
          .map { evEntry =>
            val (name, e) = (evEntry.getKey, evEntry.getValue)
            require(e.has("code"), s"event $table/$name needs a `code`")
            val time = Option(e.get("time")).filterNot(_.isNull).map(_.asText() match {
              case ColRef(c) => c
              case other =>
                throw new IllegalArgumentException(
                  s"event $table/$name time must be null or col(...), got '$other'")
            })
            val fmts = Option(e.get("time_format")).filterNot(_.isNull).map { f =>
              val raw = if (f.isArray) f.elements().asScala.map(_.asText()).toSeq else Seq(f.asText())
              raw.map(strptimeToSpark)
            }
            val extras = e.properties().asScala.toSeq
              .filterNot(p => ReservedKeys(p.getKey))
              .filter(_.getValue.isTextual)
              .map(p => p.getKey -> p.getValue.asText()).toMap
            val meta = Option(e.get("_metadata")).filterNot(_.isNull).toSeq.flatMap { m =>
              m.properties().asScala.toSeq.map { src =>
                MetadataSpec(src.getKey,
                  src.getValue.properties().asScala.toSeq
                    .map(f => f.getKey -> toColExpr(f.getValue)))
              }
            }
            EventDef(table, name,
              Extract.EventConfig(
                patientId = pid,
                time = time,
                code = codeParts(e.get("code")),
                numericValue = Option(e.get("numeric_value")).filterNot(_.isNull).map(_.asText()),
                timeFormat = fmts,
                textValue = Option(e.get("text_value")).filterNot(_.isNull).map(_.asText()),
                categoricalValue =
                  Option(e.get("categorical_value")).filterNot(_.isNull).map(_.asText()),
                extraCols = extras,
                // the reference's conversion ends in `.unique()`
                // (convert_to_sharded_events.py:500) — without it an event
                // keyed off a join-denormalized table (e.g. one admission
                // row per vitals reading) multiplies
                dedup = true),
              meta)
          }
      }
  }

  /** Convert every (table, event) block over its raw table. Returns the
    * per-definition MEDS frames keyed by (table, event name) — the
    * reference's sub-sharded layout — ready for
    * [[graft.operators.Extract.mergeCohort]].
    */
  def convert(tables: Map[String, DataFrame], events: Seq[EventDef]): Map[(String, String), DataFrame] =
    events.map { d =>
      val raw = tables.getOrElse(d.table,
        throw new IllegalArgumentException(s"no raw table '${d.table}' supplied"))
      (d.table, d.name) -> Extract.extractEvent(raw, d.cfg)
    }.toMap

  /** Extract per-code metadata for every event carrying a `_metadata`
    * block (reference: extract/extract_code_metadata.py:24-241): the
    * event's code parts are evaluated AGAINST THE METADATA TABLE (literal
    * parts stay literal, column parts read metadata columns), each output
    * field compiles through the parser DSL, rows where every field is
    * null drop out, and `parent_codes` wraps to list[str] (MEDS metadata
    * schema). Sources union diagonally; collisions are reduced by
    * [[graft.operators.Extract.extractCodeMetadataMulti]].
    */
  def extractMetadata(
      metaTables: Map[String, DataFrame],
      events: Seq[EventDef],
      descriptionSeparator: String = "; "
  ): DataFrame = {
    val blocks = for {
      d <- events
      spec <- d.metadata
    } yield {
      val src = metaTables.getOrElse(spec.source,
        throw new IllegalArgumentException(s"no metadata table '${spec.source}' supplied"))
      val codeExpr = concat_ws("//", d.cfg.code.map {
        case Extract.CodeLit(v) => lit(v)
        case Extract.CodeCol(c) => coalesce(col(c).cast("string"), lit("UNK"))
      }: _*)
      val fields = spec.fields.map { case (out, expr) =>
        val c = EventParser.toColumn(expr)
        (if (out == "parent_codes") when(c.isNotNull, array(c.cast("string"))) else c).as(out)
      }
      val anyFieldSet = spec.fields.map { case (out, _) => col(out).isNotNull }.reduce(_ || _)
      src.select((codeExpr.as(Meds.Code) +: fields): _*)
        .filter(anyFieldSet)
        .distinct()
    }
    require(blocks.nonEmpty, "no event carries a _metadata block")
    Extract.extractCodeMetadataMulti(blocks, descriptionSeparator = descriptionSeparator)
  }
}
