package graft

import java.nio.file.Files

import graft.operators.Dedup

/** The materialized dedup-artifact path: [[Dedup.buildArtifacts]] runs
  * the minhash signature → candidate-pair → component pipeline ONCE and
  * the *FromArtifacts variants must answer every component-consuming
  * query with results identical to the direct (oracle-verified) forms —
  * one corpus scan for the whole dedup report family instead of four. */
class DedupArtifactsSpec extends SparkSpec {

  test("artifact-backed dedup family equals the direct oracle-verified queries") {
    val d = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("graft-dedup-artifacts").toString

    Dedup.buildArtifacts(spark, d, out)

    // artifact files exist and are the size-targeted layout
    assert(Dedup.candidatePairsArtifact(spark, out).count() > 0)
    assert(Dedup.componentsArtifact(spark, out).count() > 0)

    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq

    val directComps = rows(Dedup.qDedupComponents(spark, d))
    val directSizes = rows(Dedup.qClusterSizes(spark, d))
    val directKeep = rows(Dedup.qDedupKeep(spark, d))
    val directPrec = rows(Dedup.qLshPrecision(spark, d))
    spark.catalog.clearCache()

    assert(rows(Dedup.componentsFromArtifacts(spark, out)) == directComps)
    assert(rows(Dedup.clusterSizesFromArtifacts(spark, out)) == directSizes)
    assert(rows(Dedup.dedupKeepFromArtifacts(spark, d, out)) == directKeep)
    assert(rows(Dedup.lshPrecisionFromArtifacts(spark, d, out)) == directPrec)
  }
}
