package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the data-quality gate a multi-table
  * ingest runs before joins are trusted (the relational twin of the
  * reference's per-stage input validation, e.g.
  * `extract/shard_events.py:1`'s schema checks).
  *
  * For each declared FK relation it reports row count, NULL-FK count,
  * orphan count (child FK value absent from the parent key set) and the
  * orphan fraction. Execution shape per relation: one left join from the
  * child onto the DISTINCT parent keys followed by a single partial
  * aggregation — the parent side is key-only (and broadcast by AQE when
  * small), so the child table is scanned exactly once per relation and
  * only its FK column crosses the wire.
  */
object Integrity {

  /** One audit row for `child.fkCol → parent.pkCol`. */
  def fkAudit(
      relation: String,
      child: DataFrame,
      fkCol: String,
      parent: DataFrame,
      pkCol: String
  ): DataFrame = {
    val keys = parent.select(col(pkCol).as("__pk")).distinct()
    child
      .select(col(fkCol).as("__fk"))
      .join(keys, col("__fk") === col("__pk"), "left")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("__fk").isNull, 1L).otherwise(0L)).as("n_null_fk"),
        sum(when(col("__fk").isNotNull && col("__pk").isNull, 1L).otherwise(0L)).as("n_orphans")
      )
      .select(
        lit(relation).as("relation"),
        col("n_rows"),
        col("n_null_fk"),
        col("n_orphans"),
        graft.functions.Portable
          .r6(col("n_orphans").cast("double") / greatest(col("n_rows"), lit(1L)).cast("double"))
          .as("orphan_frac"))
  }

  /** Audit several relations into one report frame. */
  def fkAuditAll(relations: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame =
    relations
      .map { case (name, child, fk, parent, pk) => fkAudit(name, child, fk, parent, pk) }
      .reduce(_ unionByName _)

  /** k-anonymity audit over a quasi-identifier column set: how many rows
    * sit in equivalence classes smaller than `k` — the re-identification
    * risk screen a training-data release runs before shipping anything
    * derived from user records (a (zip, age, gender) class of size 1 IS
    * a person, whatever the column names say). One groupBy to the
    * class-size frame, one aggregation over it; the report is a single
    * row: total rows, class count, singleton classes, rows below k with
    * their fraction, and the minimum class size (the dataset's actual
    * anonymity level).
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val classes = df
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    classes.agg(
      lit(k).as("k"),
      sum(col("__n")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      count(when(col("__n") === 1L, lit(1))).as("n_singletons"),
      coalesce(sum(when(col("__n") < k, col("__n"))), lit(0L)).as("n_rows_at_risk"),
      min(col("__n")).as("min_class_size"))
      .withColumn("frac_at_risk",
        col("n_rows_at_risk").cast("double") / col("n_rows").cast("double"))
  }

  /** l-diversity audit — the attribute-disclosure companion to
    * [[kAnonymity]]: a class can be k-large yet still leak ("all 50
    * people in this (zip, age) cell share the same diagnosis" — the
    * homogeneity attack k-anonymity cannot see). Per quasi-identifier
    * class the DISTINCT count of `sensitiveCol` values must reach `l`;
    * the report is one row: classes/rows below l, the minimum diversity
    * actually achieved, and the at-risk fraction.
    *
    * Same two-aggregation shape as [[kAnonymity]] (class frame then one
    * row); the distinct count is exact (count_distinct, two-level
    * partial agg), NULL sensitive values are excluded from diversity —
    * missingness is not a disclosure-protecting value.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String, l: Long): DataFrame = {
    require(l >= 2, s"l must be >= 2, got $l")
    val classes = df
      .groupBy(quasiCols.map(col): _*)
      .agg(
        count(lit(1)).as("__n"),
        countDistinct(col(sensitiveCol)).as("__ndv"))
    classes.agg(
      lit(l).as("l"),
      sum(col("__n")).as("n_rows"),
      count(lit(1)).as("n_classes"),
      count(when(col("__ndv") < l, lit(1))).as("n_classes_below_l"),
      coalesce(sum(when(col("__ndv") < l, col("__n"))), lit(0L)).as("n_rows_at_risk"),
      min(col("__ndv")).as("min_diversity"))
      .withColumn("frac_at_risk",
        col("n_rows_at_risk").cast("double") / col("n_rows").cast("double"))
  }
}
