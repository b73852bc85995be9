package graft.crawl

import org.apache.spark.sql.SparkSession

/** CLI entry point mirroring the reference's `storcrawl` wrapper
  * (storage_crawler/storcrawl:1-21, storcrawl.py:16-53):
  *
  *   runMain graft.crawl.CrawlMain --dir <root> [--dir <root2> ...]
  *     --tag <tag> --out <baseDir> [--owners <file>]
  *     [--exclude <name>]... [--join-plan] [--config-file <rc>]
  *
  * Configuration layers exactly as the reference (configargparse):
  * CLI flags > STORCRAWL_* env vars > `--config-file` (or the default
  * chain /etc/storcrawlrc, ~/storcrawlrc, ~/.storcrawlrc) — see
  * [[ConfigLayers]].
  *
  * Crawls the roots, writes `files` parquet under `<out>/crawl_tag=<tag>`
  * and prints the reference's one-line final summary (storcrawl.py:641).
  */
object CrawlMain {
  def main(args: Array[String]): Unit = {
    val (cli, positional) = ConfigLayers.parseArgs(
      args.toSeq, flags = Set("join-plan", "debug", "verbose", "stream", "once"))
    require(positional.isEmpty, s"unexpected arguments: $positional")
    val dirs = ConfigLayers.resolve("dir", cli)
    // reference stamp format when unset (storcrawl.py:58)
    val tag = ConfigLayers.resolveOne("tag", cli, Crawl.defaultTag())
    val out = ConfigLayers.resolveOne("out", cli, "target/crawl_out")
    val owners = ConfigLayers.resolve("owners", cli).lastOption
    // the reference's append-with-default quirk: '.snapshot' is always
    // excluded, layers ADD to it (storcrawl.py:39)
    val excl = FsScanner.DefaultExclusions ++ ConfigLayers.resolve("exclude", cli)
    val joinPlan = ConfigLayers.resolve("join-plan", cli)
      .lastOption.exists(ConfigLayers.isTrue)
    // the V2 distributed scan is the default path; --source bfs keeps
    // the level-by-level debug pipeline
    val useV2 = ConfigLayers.resolveOne("source", cli, "v2") == "v2"
    if (ConfigLayers.resolve("debug", cli).lastOption.exists(ConfigLayers.isTrue))
      System.err.println(
        s"[config] dirs=$dirs tag=$tag out=$out owners=$owners excl=$excl " +
        s"joinPlan=$joinPlan source=${if (useV2) "v2" else "bfs"}")
    require(dirs.nonEmpty, "at least one --dir (or STORCRAWL_DIR / rc `dir`) is required")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-crawl-$tag")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // --stream: continuous incremental crawl (T4) — snapshot batch,
      // then per-interval deltas by change-time window; --once drains
      // the currently-available window and exits (cron-style runs)
      if (ConfigLayers.resolve("stream", cli).lastOption.exists(ConfigLayers.isTrue)) {
        // stream mode is the incremental scan (+ broadcast-UDF owner
        // attribution when --owners is given): no JDBC sink, raw
        // source schema (name/is_dir kept, no insert_time) — say so
        // instead of silently ignoring
        Seq(
          "jdbc-url" -> ConfigLayers.resolve("jdbc-url", cli).nonEmpty,
          "join-plan" -> joinPlan,
          "source" -> !useV2)
          .collect { case (o, true) => o }
          .foreach(o => System.err.println(
            s"[stream] --$o is ignored in --stream mode (raw incremental scan)"))
        val interval = ConfigLayers.resolveOne("interval", cli, "60").toInt
        val once = ConfigLayers.resolve("once", cli).lastOption.exists(ConfigLayers.isTrue)
        val ctrs = Crawl.counters(spark)
        val overSub = ConfigLayers.resolve("oversubscribe", cli).lastOption.map(_.toInt)
        val q = Crawl.streamToParquet(spark, dirs, excl, out, tag, interval, once,
          ctrs = Some(ctrs), oversubscribe = overSub, ownersFile = owners)
        println(s"streaming crawl -> $out/crawl_stream_tag=$tag " +
          s"(${if (once) "available-now" else s"every ${interval}s"})")
        q.awaitTermination()
        println(Crawl.summary(ctrs))
        return
      }
      val ctrs = Crawl.counters(spark)
      // the reference's per-10k-records progress cadence (storcrawl.py:80)
      val progress = ProgressListener.register(spark, ctrs)
      val t0ms = System.currentTimeMillis()
      val overSub = ConfigLayers.resolve("oversubscribe", cli)
        .lastOption.map(_.toInt)
      val df = Crawl.run(spark, dirs, owners, excl, joinPlan,
        Some(ctrs), useV2Source = useV2, oversubscribe = overSub)
      Crawl.writeParquet(df, out, tag)
      val t1ms = System.currentTimeMillis()
      spark.sparkContext.removeSparkListener(progress)
      val status =
        Crawl.statusRows(spark, ctrs, t0ms / 1000, math.max(t1ms, t0ms + 1000) / 1000)
      Crawl.writeStatus(status, out, tag)
      // optional database sink — the reference's primary path
      // (storcrawl.py:88-165,314-417): per-tag schema bootstrap with
      // the reference's DDL types, files append, status jsonb insert
      ConfigLayers.resolve("jdbc-url", cli).lastOption.foreach { jdbcUrl =>
        val schema = ConfigLayers.resolveOne("db-schema", cli, s"storcrawl_$tag")
        val errs = Crawl.writeJdbcFull(
          spark.read.parquet(s"$out/crawl_tag=$tag"), status,
          jdbcUrl, schema,
          user = ConfigLayers.resolveOne("db-user", cli, ""),
          password = ConfigLayers.resolveOne("db-pass", cli, ""),
          dialect = ConfigLayers.resolveOne("db-dialect", cli, "postgres"))
        errs.foreach { case (sql, e) =>
          System.err.println(s"[jdbc] bootstrap failed: $sql -> $e") }
        if (errs.isEmpty) println(s"database sink: $jdbcUrl $schema.files/.status")
      }
      println(Crawl.summary(ctrs))
      val rows = spark.read.parquet(s"$out/crawl_tag=$tag").count()
      val secs = (t1ms - t0ms) / 1000.0
      println(f"rows written: $rows -> $out/crawl_tag=$tag")
      println(f"elapsed: $secs%.1f s, rate: ${rows / secs}%.0f entries/sec (source=${if (useV2) "v2" else "bfs"})")
    } finally spark.stop()
  }
}
