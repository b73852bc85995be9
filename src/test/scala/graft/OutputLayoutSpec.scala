package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.OutputLayout

/** Size-targeted writes and small-file compaction: row-identical
  * rewrites that hit the computed file count. */
class OutputLayoutSpec extends SparkSpec {

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compaction rewrites a fragmented directory to the sized file count") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft-layout").toString
    // simulate a streaming sink / wide-shuffle output: 64 tiny files
    docs.repartition(64).write.parquet(s"$dir/frag")
    assert(parquetFiles(s"$dir/frag").length == 64)

    val frag = spark.read.parquet(s"$dir/frag")
    val target = (frag.queryExecution.optimizedPlan.stats.sizeInBytes / 4).toLong.max(1)
    OutputLayout.compact(spark, s"$dir/frag", s"$dir/compact", target)

    val out = spark.read.parquet(s"$dir/compact")
    val expected = OutputLayout.sizedPartitionCount(frag, target)
    assert(parquetFiles(s"$dir/compact").length == expected)
    assert(expected < 16, s"4x target must give ~4 files, got $expected")
    // row-identical, both directions
    assert(out.exceptAll(docs).isEmpty && docs.exceptAll(out).isEmpty)
  }

  test("clustered write keeps sizing and orders files by disjoint key ranges") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft-layout-cl").toString
    val target = (docs.queryExecution.optimizedPlan.stats.sizeInBytes / 4).toLong.max(1)
    OutputLayout.writeSized(docs, s"$dir/clustered", target, Seq("doc_id"))
    val files = parquetFiles(s"$dir/clustered")
    assert(files.length == OutputLayout.sizedPartitionCount(docs, target))
    // each file covers a disjoint doc_id range (range partitioning),
    // so min/max footer pruning on doc_id can skip whole files
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("doc_id")), max(col("doc_id"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, "overlapping file ranges")
      case _ =>
    }
  }

  test("sizedPartitionCount clamps to at least one partition") {
    import spark.implicits._
    val tiny = Seq(1, 2, 3).toDF("x")
    assert(OutputLayout.sizedPartitionCount(tiny, Long.MaxValue) == 1)
    assertThrows[IllegalArgumentException] {
      OutputLayout.sizedPartitionCount(tiny, 0L)
    }
  }
}
