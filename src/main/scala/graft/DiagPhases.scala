package graft

import org.apache.spark.sql.SparkSession

/** Throwaway phase diagnostics for r16 optimization targets. Not part
  * of the shipped surface.
  */
object DiagPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val gm = new GroupMetricsListener
    spark.sparkContext.addSparkListener(gm)

    def phase[A](name: String)(f: => A): A = {
      spark.sparkContext.setJobGroup(name, name)
      val t0 = System.nanoTime()
      val r = f
      val w = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.CoreBridge
        .waitListenerBusEmpty(spark.sparkContext, 10000): Unit
      println(f"[diag] $name%-28s wall $w%7.2f s  cpu ${gm.cpuSec(name)}%8.2f s  run ${gm.runSec(name)}%8.2f s")
      spark.sparkContext.clearJobGroup()
      r
    }

    phase("warmup") { spark.read.parquet(s"$sfDir/lineitem.parquet").count() }

    // --- qHnswSearch decomposition (mirrors Similarity.qHnswSearch) ---
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.LongType
      // private[operators] helpers re-declared locally for the diag
      def decVec(emb: org.apache.spark.sql.Column) =
        transform(emb, x => x.cast("double").cast(org.apache.spark.sql.types.DecimalType(12, 8)))
      def decDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
        import org.apache.spark.sql.graftbridge.ColumnBridge
        ColumnBridge.column(graft.functions.DecimalDotExpr(
          ColumnBridge.expression(a), ColumnBridge.expression(b)))
      }
      def cosMicrosPre(dt: org.apache.spark.sql.Column, na: org.apache.spark.sql.Column, nb: org.apache.spark.sql.Column) =
        (dt.cast("double") / sqrt(na * nb)).cast(org.apache.spark.sql.types.DecimalType(10, 6)).*(lit(1000000)).cast("long")
      val Dim = 64
      import graft.functions.Exprs.md5Long
      val s = spark; val d = sfDir
      val sample = Tables.spread(Tables.embeddings(s, d))
        .filter(col("vec_id") < 512 && col("embedding").isNotNull &&
          size(col("embedding")) === Dim)
        .select(col("vec_id"), decVec(col("embedding")).as("de"))
        .withColumn("nrm", decDot(col("de"), col("de")).cast("double"))
      val sampleC = phase("hnsw-sample") { sample.localCheckpoint() }
      val cosv0 = sampleC
        .select(col("vec_id").as("qid"), col("de").as("qe"), col("nrm").as("nq"))
        .join(broadcast(sampleC.select(col("vec_id").as("nid"), col("de").as("ne"),
          col("nrm").as("nn"))), col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          cosMicrosPre(decDot(col("qe"), col("ne")), col("nq"), col("nn"))
            .as("sim_micros"))
      val cosv = phase("hnsw-cosv-512sq") { cosv0.localCheckpoint() }
      val thr = Seq(144115188075855872L, 18014398509481984L, 2251799813685248L)
      val lvlExpr = thr.map(t => s"CAST(u < ${t}L AS INT)").mkString(" + ")
      val nodes = sampleC.select(col("vec_id"))
        .withColumn("u", md5Long(concat(lit("hnsw|"), col("vec_id").cast("string"))))
        .withColumn("lvl", expr(lvlExpr).cast(LongType))
        .select("vec_id", "lvl")
      val entry = broadcast(
        nodes.orderBy(col("lvl").desc, col("vec_id")).limit(1)
          .select(col("vec_id").as("c")))
      val layers = broadcast(s.range(0, 4).select(col("id").as("l")))
      val mem = nodes.join(layers, col("lvl") >= col("l"))
        .select(col("l"), col("vec_id"))
      val wE = Window.partitionBy("l", "qid")
        .orderBy(col("sim_micros").desc, col("nid"))
      val edges0 = cosv
        .join(mem.withColumnRenamed("vec_id", "qid"), Seq("qid"))
        .join(mem.withColumnRenamed("vec_id", "nid"), Seq("l", "nid"))
        .withColumn("rk", row_number().over(wE))
        .filter(col("rk") <= when(col("l") === 0, lit(8)).otherwise(lit(16)))
        .select(col("l"), col("qid").as("src"), col("nid").as("dst"))
      val edges = phase("hnsw-edges") { edges0.localCheckpoint() }
      val probes = sampleC.select(col("vec_id").as("probe"))
      val simsByProbe = broadcast(cosv.select(col("qid").as("probe"),
        col("nid").as("cand"), col("sim_micros")))
      val edgesB = broadcast(edges)
      def step(cur: org.apache.spark.sql.DataFrame, l: Int) = {
        val cand = cur.select(col("probe"), col("c").as("cand"))
          .unionAll(cur.join(edgesB.filter(col("l") === l),
              cur("c") === col("src"))
            .select(col("probe"), col("dst").as("cand")))
        val next = cand.join(simsByProbe, Seq("probe", "cand"), "left")
          .withColumn("score",
            when(col("probe") === col("cand"), lit(1000001L))
              .otherwise(col("sim_micros")))
          .groupBy("probe")
          .agg(max_by(col("cand"), struct(col("score"), -col("cand"))).as("c"))
        (next, cand)
      }
      var cur = probes.crossJoin(entry)
      var seen = cur.select(col("probe"), col("c").as("cand"))
      phase("hnsw-walk-4layers") {
        for (l <- 3 to 0 by -1) {
          var c = cur
          for (_ <- 1 to (if (l == 0) 3 else 2)) {
            val (next, cand) = step(c, l)
            c = next
            seen = seen.unionAll(cand)
          }
          cur = c.localCheckpoint()
        }
      }
      val pool = seen
        .unionAll(cur.join(edgesB.filter(col("l") === 0), cur("c") === col("src"))
          .select(col("probe"), col("dst").as("cand")))
        .distinct()
        .filter(col("probe") =!= col("cand"))
      val top3 = pool.join(simsByProbe, Seq("probe", "cand"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("probe").orderBy(col("sim_micros").desc, col("cand"))))
        .filter(col("rk") <= 3).select("probe", "cand")
      val truth = cosv
        .withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy(col("sim_micros").desc, col("nid"))))
        .filter(col("rk") <= 3)
        .select(col("qid").as("probe"), col("nid").as("cand"))
      val hits = top3.join(truth, Seq("probe", "cand"))
        .groupBy("probe").agg(count(lit(1)).as("n_hits"))
      val out = probes.join(cur.withColumnRenamed("c", "settled"), Seq("probe"))
        .join(hits, Seq("probe"), "left")
        .na.fill(0L, Seq("n_hits"))
        .withColumn("recall_permille",
          expr("(sum(n_hits) OVER () * 1000) div (3 * count(1) OVER ())")
            .cast(LongType))
        .select(col("probe").cast(LongType).as("probe"),
          col("settled").cast(LongType).as("settled"),
          col("n_hits").cast(LongType).as("n_hits"),
          col("recall_permille"))
        .orderBy("probe")
      phase("hnsw-pool-top3-out") { out.collect(): Unit }
    }
    spark.stop()
  }
}
