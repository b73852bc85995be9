package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing diagnostics: runMain graft.Diag <query> [sfDir]
  * prints the formatted physical plan and 3 timed runs.
  *
  * KNOWN-BOUNDED `WindowExec: No Partition Defined` warnings
  * (allowlist, r13 verdict): every bare `OVER ()` on the surface sits
  * on a frame bounded BY CONSTRUCTION, not by data — the ≤512-row ANN
  * sample contract (q_hnsw_search, q_nn_descent, q_pq_train,
  * q_kmeans_step, q_mutual_knn and kin), ≤|sources| rollups (the
  * 20-source mixture/divergence family), or ≤|splits|/|buckets| grids.
  * A single-partition window over such a frame is the intended plan;
  * the warning is Spark's generic heuristic, not a scale hazard. Any
  * NEW bare OVER () must state its bound in a comment at the use site
  * (grep "bare OVER" / "bounded-by-construction"). */
object Diag {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // warm
    if (name == "dedup_family") { dedupFamily(spark, sfDir); spark.stop(); return }
    if (name == "winnow_probe") { winnowProbe(spark, sfDir); spark.stop(); return }
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }

  /** Stage-by-stage timing of the winnowing pipeline (throwaway probe). */
  private def winnowProbe(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val ws = filter(split(col("text"), " "), w => length(w) > 0)
    val grams3 = when(size(col("ws")) >= 6,
      transform(
        sequence(lit(1), size(col("ws")) - 2),
        i => md5(concat(
          element_at(col("ws"), i), lit(" "),
          element_at(col("ws"), i + 1), lit(" "),
          element_at(col("ws"), i + 2)))))
      .otherwise(array().cast("array<string>"))
    def base = Tables.spread(
      Tables.documents(spark, sfDir)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("text")))
      .select(col("doc_id"), ws.as("ws"))
      .filter(size(col("ws")) >= 6)
    def occ = base
      .select(col("doc_id"), grams3.as("hs"))
      .select(col("doc_id"), posexplode(col("hs")).as(Seq("pos", "h")))
    val w = Window.partitionBy("doc_id").orderBy("pos")
      .rowsBetween(Window.currentRow, 3)
    def winfp = occ
      .withColumn("fp", min(col("h")).over(w))
      .withColumn("nw", count(lit(1)).over(w))
      .filter(col("nw") === 4)
      .select("doc_id", "fp")
    (1 to 2).foreach { _ =>
      t("a_split")(base.count())
      t("b_grams_explode")(occ.count())
      t("c_window")(winfp.count())
      t("d_distinct")(winfp.distinct().count())
    }
  }

  /** Direct vs artifact-backed dedup report family (components,
    * cluster_sizes, dedup_keep, lsh_precision): four pipeline
    * re-derivations vs one build + four artifact reads. */
  private def dedupFamily(spark: SparkSession, sfDir: String): Unit = {
    import graft.operators.Dedup
    def timed(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.2f s ($n rows)")
      s
    }
    val direct =
      timed("direct components")(Dedup.qDedupComponents(spark, sfDir).collect().length.toLong) +
      timed("direct cluster_sizes")(Dedup.qClusterSizes(spark, sfDir).collect().length.toLong) +
      timed("direct dedup_keep")(Dedup.qDedupKeep(spark, sfDir).collect().length.toLong) +
      timed("direct lsh_precision")(Dedup.qLshPrecision(spark, sfDir).collect().length.toLong)
    val out = java.nio.file.Files.createTempDirectory("dedup-artifacts").toString
    val build = timed("buildArtifacts")({ Dedup.buildArtifacts(spark, sfDir, out); 0L })
    val art =
      timed("artifact components")(Dedup.componentsFromArtifacts(spark, out).collect().length.toLong) +
      timed("artifact cluster_sizes")(Dedup.clusterSizesFromArtifacts(spark, out).collect().length.toLong) +
      timed("artifact dedup_keep")(Dedup.dedupKeepFromArtifacts(spark, sfDir, out).collect().length.toLong) +
      timed("artifact lsh_precision")(Dedup.lshPrecisionFromArtifacts(spark, sfDir, out).collect().length.toLong)
    println(f"family total: direct $direct%.2f s vs build $build%.2f s + artifact-backed $art%.2f s")
  }
}
