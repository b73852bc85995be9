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
}
