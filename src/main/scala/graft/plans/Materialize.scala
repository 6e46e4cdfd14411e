package graft.plans

import org.apache.spark.sql.Dataset

/** Lineage pinning with a durability switch — every iterative loop and
  * multi-consumer frame in graft materializes through [[pin]] instead of
  * calling `localCheckpoint` directly.
  *
  * Default (key unset): `localCheckpoint` — blocks cached on executors,
  * zero I/O, the right call on `local[n]` and for short-lived frames.
  * Its cluster hazard: Spark CANNOT recompute a localCheckpointed
  * partition, so losing one executor mid-iteration kills the job. At
  * hundreds of executors that is an expected event, not an edge case.
  *
  * With `spark.graft.checkpointDir` set (a session conf, so one line of
  * cluster config flips the whole library — no API churn through every
  * operator): RELIABLE `checkpoint()` into that directory (HDFS/object
  * store on a cluster). Blocks are re-readable after any executor loss;
  * the job degrades to re-reading the checkpoint instead of dying.
  *
  * `eager = false` keeps the lazy variant (pin on first use) in both
  * modes — used where a frame is only SOMETIMES multi-consumed.
  */
object Materialize {

  /** Session conf key holding the reliable-checkpoint directory. */
  val DirKey = "spark.graft.checkpointDir"

  def pin[T](ds: Dataset[T], eager: Boolean): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        // setCheckpointDir is sticky on the shared context; (re)setting it
        // is idempotent and cheap relative to the checkpoint write itself.
        if (spark.sparkContext.getCheckpointDir.isEmpty ||
            !spark.sparkContext.getCheckpointDir.exists(_.contains(dir)))
          spark.sparkContext.setCheckpointDir(dir)
        ds.checkpoint(eager)
      case None => ds.localCheckpoint(eager)
    }
  }

  /** `.pin(eager)` chain syntax — a drop-in for `.localCheckpoint(eager)`. */
  implicit class PinOps[T](private val ds: Dataset[T]) extends AnyVal {
    def pin(eager: Boolean = true): Dataset[T] = Materialize.pin(ds, eager)
  }
}
