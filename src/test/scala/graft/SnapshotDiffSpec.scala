package graft

import org.apache.spark.sql.functions._

import graft.operators.Snapshots

/** Snapshot-diff semantics on an inline inventory: every status class,
  * the both-absent key, and the changed-rows-only contract. */
class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  private def writeParts(keys: (Long, Int)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("snapdiff").toString
    keys.toDF("p_partkey", "p_size")
      .select(col("p_partkey"), lit("n").as("p_name"), lit("b").as("p_brand"),
        lit("t").as("p_type"), col("p_size"), lit(1.0).as("p_retailprice"))
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    dir
  }

  test("diff classifies added / removed / changed, drops same and both-absent keys") {
    val dir = writeParts(
      (11L, 40),  // %11=0: absent from A, present in B  → added
      (13L, 41),  // %13=0: present in A, absent from B  → removed
      (14L, 42),  // in both, %7=0: size bumped in B     → changed
      (15L, 43),  // in both, untouched                  → same (excluded)
      (77L, 44),  // %11=0 and %7=0: added with the bumped size
      (143L, 45)) // %11=0 AND %13=0: in neither snapshot → no row
    val r = Snapshots.qSnapshotDiff(spark, dir).collect()
      .map(x => (x.getLong(0), x.getString(1),
        if (x.isNullAt(2)) None else Some(x.getLong(2)),
        if (x.isNullAt(3)) None else Some(x.getLong(3))))
    assert(r.toSeq === Seq(
      (11L, "added", None, Some(40L)),
      (13L, "removed", Some(41L), None),
      (14L, "changed", Some(42L), Some(43L)),
      (77L, "added", None, Some(45L))))
  }

  test("the diff join is a co-partitioned shuffle join on the snapshot key") {
    // at 100 TB both snapshots are corpus-sized: the plan must keep the
    // key-partitioned exchange shape that bucketed snapshots can elide.
    // Spark never plans a broadcast for a full-outer join, so a
    // no-BroadcastHashJoin assertion would be vacuous — assert
    // POSITIVELY on the intended shape instead: a sort-merge full-outer
    // join fed by hash-partitioned exchanges on p_partkey
    val dir = writeParts((1L, 1), (2L, 2))
    // executedPlan, not sparkPlan: exchanges are inserted by
    // EnsureRequirements, which runs after the planner — sparkPlan
    // never contains hashpartitioning and would make this vacuous too
    val plan = Snapshots.qSnapshotDiff(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), plan)
    assert(plan.contains("SortMergeJoin"), plan)
    assert("hashpartitioning\\(p_partkey".r.findAllIn(plan).size >= 2, plan)
  }

  test("merkle dirty blocks are exactly the blocks holding row-diff changes") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val blocks = Snapshots.qMerkleDiff(spark, sf).collect()
    // ground truth: hash every changed key from the row-level diff
    // into the same 64-block space
    val changedBlocks = Snapshots.qSnapshotDiff(spark, sf)
      .select(pmod(graft.functions.Exprs.md5Long(
        concat(lit("mkb|"), col("p_partkey").cast("string"))), lit(64L))
        .as("block"))
      .distinct().collect().map(_.getLong(0)).toSet
    val dirty = blocks.filter(_.getAs[Long]("dirty") == 1L)
      .map(_.getAs[Long]("block")).toSet
    // dirty ⊇ changed always; equality additionally requires no XOR
    // collision masking a change — with 60-bit digests, certain here
    assert(dirty === changedBlocks,
      s"dirty=${dirty.toSeq.sorted} changed=${changedBlocks.toSeq.sorted}")
    // clean blocks agree on both counters
    blocks.filter(_.getAs[Long]("dirty") == 0L).foreach { r =>
      assert(r.getAs[Long]("n_rows_a") === r.getAs[Long]("n_rows_b"))
    }
  }
}
