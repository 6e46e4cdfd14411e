package graft

import graft.dedup.Dedup
import graft.operators.PageRank
import graft.plans.Materialize
import org.apache.spark.sql.Row

/** The durability switch: with `spark.graft.checkpointDir` set, every
  * iterative op pins lineage via RELIABLE checkpoints (re-readable after
  * executor loss) instead of executor-local ones — and produces the exact
  * same results.
  */
class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private def edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L),
    (6L, 7L), (7L, 8L), (8L, 9L), (9L, 6L), (5L, 4L)
  ).toDF("src", "dst")

  private def withCheckpointDir[T](body: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Materialize.DirKey, dir)
    try body
    finally {
      spark.conf.unset(Materialize.DirKey)
      val root = new java.io.File(dir)
      val files = Option(root.listFiles()).getOrElse(Array.empty)
      assert(files.nonEmpty, s"no reliable checkpoint was written under $dir")
    }
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq.sortBy(_.toString)

  test("PageRank with a reliable checkpoint dir matches the local-checkpoint run") {
    val local = sortedRows(
      PageRank.pageRank(edges, iters = 3).selectExpr("node", "round(rank, 6) AS rank"))
    val reliable = withCheckpointDir {
      sortedRows(
        PageRank.pageRank(edges, iters = 3).selectExpr("node", "round(rank, 6) AS rank"))
    }
    assert(reliable == local)
  }

  test("connectedComponents (distributed loop) with a reliable checkpoint dir matches") {
    // force the distributed label-propagation path with a tiny driver cap
    val pairs = edges.toDF("id_a", "id_b")
    val local = sortedRows(Dedup.connectedComponents(pairs, maxDriverEdges = 2))
    val reliable = withCheckpointDir {
      sortedRows(Dedup.connectedComponents(pairs, maxDriverEdges = 2))
    }
    assert(reliable == local)
    // sanity: two components (1,2,3) and (6,7,8,9) plus (4,5)
    val labels = local.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(2L) == 1L && labels(3L) == 1L && labels(5L) == 4L && labels(9L) == 6L)
  }

  test("pin falls back to localCheckpoint when the conf is unset") {
    assert(spark.conf.getOption(Materialize.DirKey).isEmpty)
    val df = Materialize.pin(Seq(1, 2, 3).toDF("x"), eager = true)
    assert(df.count() == 3)
  }
}
