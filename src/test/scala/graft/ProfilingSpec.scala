package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

/** Invariants of the profiling family (sf0.001 fixtures). */
class ProfilingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("column profile: one row per column, n_rows constant, bounds hold") {
    val r = Profiling.qColumnProfile(spark, sf).collect()
    assert(r.map(_.getAs[String]("column")).toSeq ===
      Seq("event_id", "event_type", "props", "ts", "user_id", "value_cents"))
    val n = Tables.events(spark, sf).count()
    r.foreach { x =>
      assert(x.getAs[Long]("n_rows") === n)
      assert(x.getAs[Long]("n_null") + x.getAs[Long]("n_distinct") <= n + 1)
    }
    // event_id is the primary key: all-distinct, no nulls
    val pk = r.find(_.getAs[String]("column") == "event_id").get
    assert(pk.getAs[Long]("n_distinct") === n && pk.getAs[Long]("n_null") === 0L)
  }

  test("zone map: blocks partition the corpus; skip flag honest") {
    val r = Profiling.qZoneMap(spark, sf).collect()
    assert(r.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).filter(col("text").isNotNull).count())
    r.foreach { x =>
      assert(x.getAs[Long]("min_chars") <= x.getAs[Long]("max_chars"))
      assert(x.getAs[Long]("skippable") ===
        (if (x.getAs[Long]("max_chars") < 256) 1L else 0L))
    }
    // the reference predicate must actually split the blocks (a zone
    // map where nothing or everything skips proves nothing)
    val sk = r.map(_.getAs[Long]("skippable")).sum
    assert(sk > 0 && sk < r.length)
  }

  test("kmv estimate: exact for tiny sets, bounded error for the rest") {
    val r = Profiling.qKmvCardinality(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (ex, est) = (x.getAs[Long]("n_exact"), x.getAs[Long]("n_est"))
      assert(ex > 0 && est > 0)
      // k=16 sketch: relative error concentrated within ~1/sqrt(k-1);
      // allow a generous 3-sigma band
      assert(math.abs(est - ex).toDouble / ex < 0.85, s"$ex vs $est")
      assert(x.getAs[Long]("err_permille") === (est - ex) * 1000 / ex)
    }
  }

  test("zorder layout prunes BOTH dimensions; single-column sort only one") {
    val r = Profiling.qZorderLayout(spark, sf).collect()
    assert(r.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).filter(col("text").isNotNull).count())
    // conjunction flag = OR of the single-dimension flags
    r.foreach { x =>
      assert(x.getAs[Long]("skip_conj") ===
        math.max(x.getAs[Long]("skip_len"), x.getAs[Long]("skip_src")))
      assert(x.getAs[Long]("min_src") <= x.getAs[Long]("max_src"))
    }
    // the morton layout must make SOME blocks skippable on EACH axis —
    // that is the whole point of interleaving vs a single-column sort
    assert(r.map(_.getAs[Long]("skip_len")).sum > 0)
    assert(r.map(_.getAs[Long]("skip_src")).sum > 0)
  }

  test("bigram ttr: distinct <= total, permille in range, all sources present") {
    val r = Profiling.qBigramTtr(spark, sf).collect()
    assert(r.length === Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("source").distinct().count())
    r.foreach { x =>
      assert(x.getAs[Long]("n_distinct") <= x.getAs[Long]("n_bigrams"))
      val t = x.getAs[Long]("ttr_permille")
      assert(t > 0 && t <= 1000)
    }
  }

  test("gram dup curve: hand-computable on one doc; monotone non-increasing on fixture") {
    // "a b a b a": totals 5,4,3,2,1 and distinct 2,2,2,2,1 for n=1..5;
    // orders 6..8 have no grams and must be absent, not zero rows
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dupcurve-spec").toString
    Seq((0L, "a b a b a", "en", "web", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Profiling.qGramDupCurve(spark, dir).collect().map(r =>
      (r.getAs[Long]("n"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_distinct"), r.getAs[Long]("dup_permille")))
    spark.catalog.clearCache()
    assert(rows.toSeq === Seq(
      (1L, 5L, 2L, 600L), (2L, 4L, 2L, 500L), (3L, 3L, 2L, 333L),
      (4L, 2L, 2L, 0L), (5L, 1L, 1L, 0L)), rows.mkString(","))
    // real fixture: longer grams can only be rarer and less duplicated
    val r = Profiling.qGramDupCurve(spark, sf).collect()
    assert(r.length === 8) // 50+-word docs carry all 8 orders
    val dup = r.sortBy(_.getAs[Long]("n")).map(_.getAs[Long]("dup_permille"))
    assert(dup.toSeq === dup.toSeq.sorted.reverse, dup.mkString(","))
  }

  test("stupid backoff: hand-built model exercises both branches exactly") {
    // ids 0,1 are train under md5('sb|'||id) % 10 (6,4); id 4 is eval (0).
    // Model: "x y x y x" + "z z z" → c(x)=3 c(y)=2 c(z)=3, N=8,
    // bigrams {x y:2, y x:2, z z:2}. Eval "x y z q":
    //   (x,y) seen  → ⌊1000·log2(3/2)⌋  = 584
    //   (y,z) unseen→ ⌊1000·log2(2.5·8/3)⌋ = 2736
    //   (z,q) unseen, q OOV → ⌊1000·log2(2.5·8/1)⌋ = 4321
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sb-spec").toString
    Seq(
      (0L, "x y x y x", "en", "web", 9L),
      (1L, "z z z", "en", "web", 5L),
      (4L, "x y z q", "en", "web", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.operators.CorpusOps.qStupidBackoff(spark, dir).collect()
      .map(x => (x.getLong(0), x.getAs[Long]("n_bigrams"), x.getAs[Long]("n_backoff"),
        x.getAs[Long]("bits_milli"), x.getAs[Long]("bpt_milli")))
    spark.catalog.clearCache()
    assert(r.toSeq === Seq((4L, 3L, 2L, 7641L, 2547L)), r.mkString(","))
    // real fixture: surprisal positive, backoff bounded by pair count
    val a = graft.operators.CorpusOps.qStupidBackoff(spark, sf).collect()
    assert(a.nonEmpty)
    a.foreach { x =>
      assert(x.getAs[Long]("bits_milli") >= 0)
      assert(x.getAs[Long]("n_backoff") <= x.getAs[Long]("n_bigrams"))
    }
    // (no backoff assertion on the fixture: its 31-word vocabulary is so
    // dense every eval transition is seen in training — the hand-built
    // model above is what pins the smoothing branch)
  }

  test("sort advisor: blocked run counting equals a brute global sort") {
    val docs = Tables.documents(spark, sf)
      .filter(col("lang").isNotNull && col("source").isNotNull &&
        col("n_chars").isNotNull)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        (r.getLong(3) / 128).toString))
    def runsOf(key: ((Long, String, String, String)) => String,
        payload: ((Long, String, String, String)) => String): Long = {
      docs.groupBy(key).values.map { grp =>
        val vals = grp.sortBy(_._1).map(payload)
        1L + vals.sliding(2).count(p => p.length == 2 && p(0) != p(1))
      }.sum
    }
    val keys = Map[String, ((Long, String, String, String)) => String](
      "lang" -> (_._2), "source" -> (_._3),
      "lang,source" -> (t => t._2 + "|" + t._3))
    val payloads = Map[String, ((Long, String, String, String)) => String](
      "lang" -> (_._2), "source" -> (_._3), "len_bkt" -> (_._4))
    val got = Profiling.qSortAdvisor(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_runs"), r.getAs[Long]("mean_run_milli")))).toMap
    assert(got.size === 9)
    for ((kn, kf) <- keys; (cn, cf) <- payloads) {
      val runs = runsOf(kf, cf)
      assert(got((kn, cn))._1 === runs, s"$kn/$cn")
      assert(got((kn, cn))._2 === docs.length.toLong * 1000 / runs, s"$kn/$cn")
    }
  }

  test("sort advisor: block-boundary stitch survives gaps and 8192 crossings") {
    // en: doc_ids 8190,8191 (blk 0) + 8192,8193 (blk 1), same source
    //   -> source runs must stitch to 1 ACROSS the block boundary
    // de: doc_ids 100 (blk 0) and 17000 (blk 2, blk 1 EMPTY for de),
    //   same source -> the gap must stitch too (prev NON-EMPTY block)
    // fr: 200 (blk 0, src x) and 18000 (blk 2, src y)
    //   -> differing boundary values stay 2 runs
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("advisor").toString
    Seq(
      (8190L, "en", "sx"), (8191L, "en", "sx"),
      (8192L, "en", "sx"), (8193L, "en", "sx"),
      (100L, "de", "sx"), (17000L, "de", "sx"),
      (200L, "fr", "sx"), (18000L, "fr", "sy"))
      .toDF("doc_id", "lang", "source")
      .select(col("doc_id"), lit("t").as("text"), col("lang"), col("source"),
        lit(10L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Profiling.qSortAdvisor(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_runs"))
      .toMap
    // sorted by lang: runs of source = en(1) + de(1, gap-stitched)
    //   + fr(2, boundary values differ) = 4
    assert(got(("lang", "source")) === 4L)
    // sorted by lang: runs of lang = 3 (one per key group)
    assert(got(("lang", "lang")) === 3L)
    // sorted by source: sx rows ordered 100,200,8190..8193,17000 ->
    // lang runs de,fr,en,de = 4; sy -> fr = 1
    assert(got(("source", "lang")) === 5L)
  }

  test("sort advisor: mean run length identity on single-run fixture") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("advisor1").toString
    (0L until 6L).map(i => (i, "en", "s0"))
      .toDF("doc_id", "lang", "source")
      .select(col("doc_id"), lit("t").as("text"), col("lang"), col("source"),
        lit(10L).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Profiling.qSortAdvisor(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_runs"), r.getAs[Long]("mean_run_milli")))).toMap
    // every payload constant: 1 run of length 6 under every key
    got.values.foreach { case (runs, mean) =>
      assert(runs === 1L); assert(mean === 6000L)
    }
  }
}
