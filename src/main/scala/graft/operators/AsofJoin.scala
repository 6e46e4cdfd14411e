package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Temporal as-of join: attach to each left row the single right row with
  * the greatest right-time <= left-time (backward, the default), the
  * least right-time >= left-time (forward), or whichever of the two is
  * closer (nearest, ties backward), per join key. The semantics
  * of pandas `merge_asof` / DuckDB `ASOF JOIN` — the standard way to
  * align measurements with the most recent preceding state (last lab
  * value before an event, last purchase before a click, ...).
  *
  * Spark has no native as-of join, and the naive formulations are scale
  * traps: an inequality theta-join degenerates to broadcast-nested-loop
  * (O(|L|·|R|) per key), and a per-key `collect_list` + UDF binary
  * search buffers unboundedly on hot keys. This implementation instead
  * uses the union-and-scan shape: tag both inputs, union them, and run
  * ONE key-partitioned window ordered by (time, side) in which each left
  * row picks up `last(right_payload, ignoreNulls)` over the preceding
  * rows. Cost at any scale = one shuffle on the join key + one in-
  * partition sort — identical to the patient-keyed window chains used by
  * tokenization; no join, no per-key buffering beyond Spark's spillable
  * window sort, skew handled the same way (AQE / salting a hot key).
  *
  * Contracts:
  *   - right rows with NULL time are ignored; left rows with NULL time
  *     get no match (guarded explicitly — in the forward direction the
  *     nulls-first sort would otherwise hand them the earliest right
  *     row).
  *   - NULL join keys never match, same as every equality join here and
  *     in pandas/DuckDB: null-key right rows are dropped, null-key left
  *     rows pass through unmatched.
  *   - if several right rows share (key, time), the tie-break is
  *     deterministic via the payload struct in the window order:
  *     backward picks the GREATEST payload struct, forward the LEAST
  *     (each direction takes the frame row nearest the left row).
  *     Pre-aggregate the right side to one row per (key, time) when a
  *     specific reducer is wanted.
  *   - `toleranceUs`: matches farther than this from the left time are
  *     nulled out (microseconds for timestamp time columns, native units
  *     for numeric ones).
  */
object AsofJoin {

  final val Backward = "backward"
  final val Forward = "forward"
  final val Nearest = "nearest"

  def asof(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightCols: Seq[String],
      direction: String = Backward,
      rightPrefix: String = "matched_",
      toleranceUs: Option[Long] = None
  ): DataFrame = {
    require(on.nonEmpty, "asof join needs at least one equality key")
    require(direction == Backward || direction == Forward || direction == Nearest,
      s"direction must be backward|forward|nearest, got $direction")
    require(rightCols.nonEmpty, "rightCols: name the right-side payload columns to attach")
    if (direction == Nearest)
      return asofNearest(left, right, on, leftTimeCol, rightTimeCol, rightCols,
        rightPrefix, toleranceUs)

    val backward = direction == Backward
    // left rows must sort AFTER eligible right rows at equal time
    // (inclusive match): backward scans preceding rows so right gets the
    // smaller side tag; forward scans following rows so right gets the
    // larger one.
    val (leftTag, rightTag) = if (backward) (1, 0) else (0, 1)

    val payloadFields = rightTimeCol +: rightCols.filterNot(_ == rightTimeCol)
    val payloadStruct = struct(payloadFields.map(col): _*)
    val payloadType = right.select(payloadStruct.as("__m")).schema("__m").dataType

    val leftOther = left.columns.filterNot(on.contains).toSeq
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap

    val lhs = left.select(
      on.map(col) ++
        Seq(col(leftTimeCol).as("__t"), lit(leftTag).as("__side"), lit(null).cast(payloadType).as("__m")) ++
        leftOther.map(col): _*)
    val rhs = right
      .filter(col(rightTimeCol).isNotNull && on.map(col(_).isNotNull).reduce(_ && _))
      .select(
        on.map(col) ++
          Seq(col(rightTimeCol).as("__t"), lit(rightTag).as("__side"), payloadStruct.as("__m")) ++
          leftOther.map(c => lit(null).cast(leftTypes(c)).as(c)): _*)

    // payload struct as final order key = deterministic winner among
    // right rows tied on (key, time)
    val w0 = Window.partitionBy(on.map(col): _*).orderBy(col("__t"), col("__side"), col("__m"))
    val (w, pick) =
      if (backward) (w0.rowsBetween(Window.unboundedPreceding, Window.currentRow), last(col("__m"), ignoreNulls = true))
      else (w0.rowsBetween(Window.currentRow, Window.unboundedFollowing), first(col("__m"), ignoreNulls = true))

    // null-time left rows must not match (forward frames would otherwise
    // see every following right row); null-key right rows are already
    // filtered, so null-key left rows fall through to null here too.
    val matchedRaw = lhs.unionByName(rhs)
      .withColumn("__m_hit", when(col("__t").isNotNull, pick.over(w)))
      .filter(col("__side") === leftTag)

    val matched = toleranceUs match {
      case None => matchedRaw.withColumn("__m_ok", col("__m_hit"))
      case Some(tol) =>
        val isTs = left.schema(leftTimeCol).dataType == TimestampType
        def us(c: Column): Column = if (isTs) unix_micros(c) else c.cast("long")
        val mt = col("__m_hit").getField(rightTimeCol)
        val dist = if (backward) us(col("__t")) - us(mt) else us(mt) - us(col("__t"))
        matchedRaw.withColumn("__m_ok", when(dist <= tol, col("__m_hit")))
    }

    matched.select(
      left.columns.map(col).toSeq ++
        payloadFields.map(f => col("__m_ok").getField(f).as(rightPrefix + f)): _*)
  }

  /** `nearest` direction: whichever of the backward/forward matches is
    * closer in time wins; exact ties go BACKWARD (the stable
    * convention — an equal-time right row is distance 0 through the
    * backward pick, so the forward frame may safely exclude it).
    * SAME execution shape as the directed variants: one union, one
    * key-partitioned sort — the two window frames (preceding-last and
    * following-first) share the single exchange+sort, so nearest costs
    * the same shuffle as backward. `toleranceUs` nulls each candidate
    * independently before the choice (pandas merge_asof semantics).
    */
  private def asofNearest(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      rightCols: Seq[String],
      rightPrefix: String,
      toleranceUs: Option[Long]
  ): DataFrame = {
    val payloadFields = rightTimeCol +: rightCols.filterNot(_ == rightTimeCol)
    val payloadStruct = struct(payloadFields.map(col): _*)
    val payloadType = right.select(payloadStruct.as("__m")).schema("__m").dataType
    val leftOther = left.columns.filterNot(on.contains).toSeq
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    // right sorts BEFORE left at equal time: the backward frame sees the
    // equal-time right (distance 0, and backward wins ties), so the
    // forward frame not seeing it is correct by construction.
    val lhs = left.select(
      on.map(col) ++
        Seq(col(leftTimeCol).as("__t"), lit(1).as("__side"),
          lit(null).cast(payloadType).as("__m")) ++
        leftOther.map(col): _*)
    val rhs = right
      .filter(col(rightTimeCol).isNotNull && on.map(col(_).isNotNull).reduce(_ && _))
      .select(
        on.map(col) ++
          Seq(col(rightTimeCol).as("__t"), lit(0).as("__side"), payloadStruct.as("__m")) ++
          leftOther.map(c => lit(null).cast(leftTypes(c)).as(c)): _*)
    val w0 = Window.partitionBy(on.map(col): _*).orderBy(col("__t"), col("__side"), col("__m"))
    val pickB = last(col("__m"), ignoreNulls = true)
      .over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val pickF = first(col("__m"), ignoreNulls = true)
      .over(w0.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val isTs = left.schema(leftTimeCol).dataType == TimestampType
    def us(c: Column): Column = if (isTs) unix_micros(c) else c.cast("long")
    val matched = lhs.unionByName(rhs)
      .withColumn("__mb", when(col("__t").isNotNull, pickB))
      .withColumn("__mf", when(col("__t").isNotNull, pickF))
      .filter(col("__side") === 1)
    val db = us(col("__t")) - us(col("__mb").getField(rightTimeCol))
    val df = us(col("__mf").getField(rightTimeCol)) - us(col("__t"))
    val tol = toleranceUs.map(lit(_)).getOrElse(lit(Long.MaxValue))
    val okB = when(col("__mb").isNotNull && db <= tol, col("__mb"))
    val okF = when(col("__mf").isNotNull && df <= tol, col("__mf"))
    val hit = when(okB.isNotNull && (okF.isNull || db <= df), okB).otherwise(okF)
    matched
      .withColumn("__m_ok", hit)
      .select(
        left.columns.map(col).toSeq ++
          payloadFields.map(f => col("__m_ok").getField(f).as(rightPrefix + f)): _*)
  }
}
