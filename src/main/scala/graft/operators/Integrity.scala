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
}
