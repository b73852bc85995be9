package graft

import org.apache.spark.sql.functions._

import graft.operators.{Relevance, Selection, Sequences, Similarity}

/** Semantic invariants of the event-sequence, data-selection, and
  * sparse/hard-negative retrieval families, on the sf0.001 fixtures.
  * (Oracle hash equality is the driver gate; these pin the properties
  * a hash can't name — conservation laws, determinism, predicate
  * containment.)
  */
class SequencesSelectionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("transition counts conserve events: sum = n_events - n_active_users") {
    val ev = Tables.events(spark, sf)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    val total = Sequences.qEventTransitions(spark, sf)
      .agg(sum("n_transitions")).collect()(0).getLong(0)
    // each user contributes (events_u - 1) consecutive pairs
    assert(total === nEvents - nUsers)
  }

  test("epoch shuffle: footrule replays exactly from a JVM md5 of the planted corpus") {
    import java.nio.file.Files
    import java.nio.file.Paths
    val dir = Files.createTempDirectory(Paths.get("target"), "epochs").toString
    val ids = (1L to 9L)
    import spark.implicits._
    ids.map(i => (i, s"doc $i", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // replicate md5Long: first 15 hex chars of md5 as a Long
    def h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    def ranks(e: Int): Map[Long, Long] =
      ids.sortBy(i => (h(s"ep|$e|$i"), i)).zipWithIndex
        .map { case (i, r) => i -> (r + 1L) }.toMap
    val want = for ((a, b) <- Seq((0, 1), (0, 2), (1, 2))) yield {
      val (ra, rb) = (ranks(a), ranks(b))
      val f = ids.map(i => math.abs(ra(i) - rb(i))).sum
      ((a.toLong, b.toLong), (f, f * 2000 / (9L * 9L)))
    }
    val got = Selection.qEpochShuffle(spark, dir).collect()
      .map(r => (r.getAs[Long]("epoch_a"), r.getAs[Long]("epoch_b")) ->
        ((r.getAs[Long]("footrule"),
          r.getAs[Long]("footrule_permille")))).toMap
    assert(got === want.toMap)
    // ranks are a permutation: every epoch pair covers all 9 docs
    assert(got.values.forall(_._1 >= 0))
  }

  test("prefix cache: hand-planted shared openings at every depth") {
    import java.nio.file.Files
    import java.nio.file.Paths
    val dir = Files.createTempDirectory(Paths.get("target"), "prefixes").toString
    import spark.implicits._
    val p16 = (1 to 16).map(i => s"t$i").mkString(" ")
    Seq(
      (1L, s"$p16 alpha beta"),         // 18 tokens, shares p16 with doc 2
      (2L, s"$p16 gamma"),              // 17 tokens
      (3L, "a b c d e f g h x"),        // 9 tokens: depth 4+8 only
      (4L, "a b c d Z Z Z Z Z"),        // shares depth-4 prefix with doc 3
      (5L, "one two three"))            // 3 tokens: below every depth
      .map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.CorpusOps.qPrefixCache(spark, dir).collect()
      .map(r => r.getAs[Long]("depth") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_groups"),
          r.getAs[Long]("n_shared_groups"), r.getAs[Long]("saved_tokens"),
          r.getAs[Long]("hit_permille")))).toMap
    // depth 4: docs 1-4 eligible; groups {p4(1,2)}, {abcd(3,4)} shared
    assert(got(4L) === ((4L, 2L, 2L, 8L, 500L)))
    // depth 8: docs 1-4; doc3/doc4 prefixes diverge at token 5
    assert(got(8L) === ((4L, 3L, 1L, 8L, 250L)))
    // depth 16: docs 1-2 share the full p16
    assert(got(16L) === ((2L, 1L, 1L, 16L, 500L)))
  }

  test("inbatch collisions: pair algebra replays; batches conserve the corpus") {
    val rows = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val got = Selection.qInbatchCollisions(spark, sf).collect()
      .map(r => r.getAs[Long]("batch") ->
        ((r.getAs[Long]("batch_size"), r.getAs[Long]("n_collisions"),
          r.getAs[Long]("n_pairs"), r.getAs[Long]("collision_permille"))))
      .toMap
    // batches partition the corpus
    assert(got.values.map(_._1).sum === rows.length.toLong)
    got.values.foreach { case (b, coll, pairs, pm) =>
      assert(pairs === b * (b - 1) / 2)
      assert(coll <= pairs) // colliding pairs are pairs
      assert(pm >= 0L && pm <= 1000L)
      if (pairs > 0) assert(pm === coll * 1000 / pairs)
    }
    // batching can only LOSE same-label pairs (splitting a label class
    // across batches removes its cross-batch pairs): the within-batch
    // collision total is bounded by the corpus-wide same-label pairs
    assert(got.values.map(_._2).sum <=
      rows.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum)
  }

  test("session_window: native operator replays from a brute gap walk") {
    val gapUs = 604800L * 1000000L
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), expr("ts div 1000").as("us"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = ev.groupBy(_._1).flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(t => (t._3, t._2))
      // STRICT >: Spark merges an event at exactly last + gap (touching
      // windows coalesce) — pinned by the planted boundary test below
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) {
        case (acc, e) =>
          if (e._3 - acc.head.head._3 > gapUs) List(e) :: acc
          else (e :: acc.head) :: acc.tail
      }.map(_.reverse).reverse
      sessions.map { sess =>
        (uid, sess.map(_._3).min) ->
          ((sess.map(_._3).max + gapUs, sess.size.toLong,
            sess.map(_._4).sum, sess.map(_._2).min))
      }
    }.toMap
    val got = graft.operators.Reports.qSessionWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("start_us")) ->
        ((r.getAs[Long]("end_us"), r.getAs[Long]("n_events"),
          r.getAs[Long]("sum_cents"), r.getAs[Long]("first_event_id"))))
      .toMap
    assert(got === expected)
    // sessions conserve events
    assert(got.values.map(_._2).sum === ev.length.toLong)
  }

  test("session_window boundary: exactly last + gap MERGES, gap + 1 splits") {
    // the sf fixture has no exact-gap pair, so only this planted case
    // distinguishes Spark's measured `> gap` rule from the `>=` reading
    // (which would emit 3 sessions here and a different end_us)
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory(Paths.get("target"), "sessgap").toString
    import spark.implicits._
    val gapUs = 604800L * 1000000L
    val t0 = 1700000000L * 1000000L // epoch-micros
    Seq(
      (7L, 1L, (t0) * 1000L, 1.0),
      (7L, 2L, (t0 + gapUs) * 1000L, 2.0),          // exactly last + gap → merge
      (7L, 3L, (t0 + 2 * gapUs + 1) * 1000L, 3.0))  // gap + 1 past new last → split
      .toDF("user_id", "event_id", "ts", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Reports.qSessionWindow(spark, dir).collect()
      .map(r => (r.getAs[Long]("start_us"), r.getAs[Long]("end_us"),
        r.getAs[Long]("n_events")))
      .sortBy(_._1)
    assert(got.length === 2, s"expected merge-then-split, got ${got.toSeq}")
    assert(got(0) === ((t0, t0 + 2 * gapUs, 2L)),
      "touching windows coalesce; end extends to merged last + gap")
    assert(got(1) === ((t0 + 2 * gapUs + 1, t0 + 3 * gapUs + 1, 1L)))
  }

  test("attribution: both models replay from a brute per-user walk") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        graft.functions.Exprs.nanosToSec(col("ts")).as("sec"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._1).view.mapValues(_.sortBy(t => (t._3, t._2)))
    val convs = byUser.values.flatMap { seq =>
      seq.zipWithIndex.collect {
        case ((_, _, _, "purchase"), i) if i > 0 =>
          (seq.head._4, seq(i - 1)._4) // (first_touch, last_touch)
      }
    }.toSeq
    val expFirst = convs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expLast = convs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = Sequences.qAttribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_conversions"), r.getAs[Long]("share_permille"))))
      .toMap
    val total = convs.size.toLong
    expFirst.foreach { case (t, n) =>
      assert(got(("first_touch", t)) == ((n, n * 1000 / total)), s"first $t") }
    expLast.foreach { case (t, n) =>
      assert(got(("last_touch", t)) == ((n, n * 1000 / total)), s"last $t") }
    // each model's credits conserve the conversion count
    Seq("first_touch", "last_touch").foreach { m =>
      assert(got.collect { case ((`m`, _), (n, _)) => n }.sum == total)
    }
  }

  test("temporal decay: weights replay from a brute shift; shares conserve") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"),
        graft.functions.Exprs.nanosToSec(col("ts")).as("sec"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val maxSec = ev.map(_._2).max
    val expected = ev.groupBy(_._1).view.mapValues { g =>
      val mass = g.map { case (_, sec) =>
        val wk = math.min((maxSec - sec) / 86400 / 7, 40L)
        1000000L >> wk
      }.sum
      (g.size.toLong, mass)
    }.toMap
    val got = Sequences.qTemporalDecay(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("w_mass"),
          r.getAs[Long]("raw_permille"), r.getAs[Long]("decay_permille"))))
      .toMap
    val totalN = expected.values.map(_._1).sum
    val totalW = expected.values.map(_._2).sum
    expected.foreach { case (t, (n, w)) =>
      assert(got(t) == ((n, w, n * 1000 / totalN, w * 1000 / totalW)), t)
    }
    // shares sum to ~1000 (flooring loses at most |types|-1 permille)
    assert(math.abs(got.values.map(_._3).sum - 1000L) < got.size)
    assert(math.abs(got.values.map(_._4).sum - 1000L) < got.size)
    // the freshest events carry full weight: max w_mass <= 1e6 * n
    got.values.foreach { case (n, w, _, _) => assert(w <= 1000000L * n) }
  }

  test("window_distinct conserves events and bounds distinct users") {
    val r = Sequences.qWindowDistinct(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    assert(r.map(_.getAs[Long]("n_events")).sum === ev.count())
    assert(r.forall(x =>
      x.getAs[Long]("n_users") <= x.getAs[Long]("n_events")))
    // buckets are hour-aligned and strictly increasing
    val b = r.map(_.getAs[Long]("hour_bucket"))
    assert(b.forall(_ % 3600 == 0) && (b sameElements b.sorted.distinct))
  }

  test("ewma first event per user is its own estimate; later ones stay in range") {
    val r = Sequences.qEwmaTrailing(spark, sf)
    import spark.implicits._
    val firsts = r.groupBy("user_id")
      .agg(min(struct(col("event_id"), col("v_cents"), col("smooth_cents"))).as("f"))
      .select($"f.v_cents", $"f.smooth_cents").collect()
    assert(firsts.forall(x => x.getLong(0) === x.getLong(1)))
    // smoothing is a weighted mean: never outside the running min/max —
    // spot-check: smooth within [min_cents, max_cents] of the user
    val bounds = Tables.events(spark, sf)
      .select(col("user_id"),
        graft.functions.Exprs.intScaled(
          graft.functions.Exprs.dec2(col("value")), 100L).as("v"))
      .groupBy("user_id").agg(min("v").as("lo"), max("v").as("hi"))
    val joined = r.join(bounds, "user_id")
      .filter(col("smooth_cents") < col("lo") - 1 || col("smooth_cents") > col("hi"))
    assert(joined.count() === 0)
  }

  test("burst ranking returns 10 rows with sane permille and conservation") {
    val r = Sequences.qBurstUsers(spark, sf).collect()
    assert(r.length === 10)
    val p = r.map(_.getAs[Long]("burst_permille"))
    assert(p.forall(x => x >= 0 && x <= 1000))
    // ranked descending
    assert(p.toSeq === p.toSeq.sorted.reverse)
    assert(r.forall(x => x.getAs[Long]("max_hour") <= x.getAs[Long]("n_events")))
  }

  test("length fence keeps at least 90% per language and thresholds order") {
    val r = Selection.qLengthFence(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("lo_chars") <= x.getAs[Long]("hi_chars"))
      // p05..p95 of a group always contains >= 90% of its rows
      assert(x.getAs[Long]("n_kept") * 10 >= x.getAs[Long]("n_docs") * 9)
      assert(x.getAs[Long]("drop_permille") <= 100)
    }
  }

  test("weighted sample is deterministic and monotone in weight") {
    val a = Selection.qWeightedSample(spark, sf).collect()
    val b = Selection.qWeightedSample(spark, sf).collect()
    assert(a.map(_.toString) sameElements b.map(_.toString))
    // kept docs carry their true permille weight
    assert(a.forall(x =>
      x.getAs[Long]("p_permille") === math.min(x.getAs[Long]("n_chars") / 2, 1000L)))
  }

  test("class balance equalizes every label to the min class count") {
    val r = Selection.qClassBalance(spark, sf)
    val perLabel = r.groupBy("label").count().collect()
      .map(_.getAs[Long]("count")).distinct
    assert(perLabel.length === 1) // all labels identical size
    val minCnt = Tables.embeddings(spark, sf)
      .groupBy("label").count().agg(min("count")).collect()(0).getLong(0)
    assert(perLabel.head === minCnt)
  }

  test("hard negatives never share the probe's label and rank within bounds") {
    val r = Similarity.qHardNegatives(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.forall(x =>
      x.getAs[Long]("true_label") != x.getAs[Long]("neg_label")))
    assert(r.forall(x => { val k = x.getAs[Long]("rnk"); k >= 1 && k <= 3 }))
    assert(r.forall(x => math.abs(x.getAs[Long]("sim_micros")) <= 1000000L))
  }

  test("ab test: both arms present, counters conserve the stream") {
    val r = Sequences.qAbTest(spark, sf).collect()
    assert(r.map(_.getAs[String]("arm")).toSeq === Seq("A", "B"))
    val ev = Tables.events(spark, sf)
    assert(r.map(_.getAs[Long]("n_events")).sum === ev.count())
    assert(r.map(_.getAs[Long]("n_users")).sum ===
      ev.select("user_id").distinct().count()) // arms partition users
    r.foreach { x =>
      assert(x.getAs[Long]("purchase_permille") <= 1000L)
      assert(x.getAs[Long]("mean_cents") ===
        x.getAs[Long]("sum_cents") / x.getAs[Long]("n_events"))
    }
  }

  test("funnel time: converted count bounded by users, p50 <= p90") {
    val r = Sequences.qFunnelTime(spark, sf).collect()
    assert(r.length === 1)
    val x = r.head
    assert(x.getAs[Long]("n_converted") > 0)
    assert(x.getAs[Long]("n_converted") <=
      Tables.events(spark, sf).select("user_id").distinct().count())
    assert(x.getAs[Long]("p50_sec") <= x.getAs[Long]("p90_sec"))
    assert(x.getAs[Long]("p50_sec") >= 0)
  }

  test("log histogram: buckets partition the corpus, bounds inside the bucket") {
    val r = graft.operators.TextStats.qLogHistogram(spark, sf).collect()
    assert(r.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sf).filter(col("text").isNotNull).count())
    r.foreach { x =>
      val b = x.getAs[Long]("bucket")
      assert(x.getAs[Long]("min_chars") >= (1L << b))
      assert(x.getAs[Long]("max_chars") < (1L << (b + 1)))
    }
  }

  test("interval overlap: bucketed rewrite plans NO nested-loop join; overlaps positive") {
    val df = Sequences.qIntervalOverlap(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val r = df.collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val o = x.getAs[Long]("overlap_sec")
      assert(o >= 1 && o <= 3600)
    }
  }

  test("concurrency curve: decomposition equals the naive global sweep") {
    import org.apache.spark.sql.expressions.Window
    val r = Sequences.qConcurrencyCurve(spark, sf).collect()
    assert(r.nonEmpty)
    val nSessions = graft.operators.Reports.qSessionize(spark, sf).count()
    assert(r.map(_.getAs[Long]("n_starts")).sum === nSessions)
    assert(r.map(_.getAs[Long]("n_ends")).sum === nSessions)
    // naive single global running sum (what the oracle also runs),
    // computed Spark-side as an independent check of the decomposition
    val sess = graft.operators.Reports.qSessionize(spark, sf)
      .select(col("session_start").as("st"), col("session_end").as("en"))
    val deltas = sess.select(col("st").as("t"), lit(1L).as("dv"))
      .unionAll(sess.select((col("en") + 1L).as("t"), lit(-1L).as("dv")))
    val naive = deltas
      .withColumn("run", sum(col("dv")).over(
        Window.orderBy(col("t"), col("dv"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(expr("t div 604800").as("bucket"))
      .agg(max(col("run")).as("mx"))
      .collect().map(x => (x.getLong(0), x.getAs[Long]("mx"))).toMap
    r.foreach { x =>
      assert(x.getAs[Long]("max_concurrent") ===
        naive(x.getAs[Long]("bucket")), s"bucket ${x.getAs[Long]("bucket")}")
    }
    // the in-bucket window must run PARTITIONED on the bucket key —
    // the whole point of the decomposition is that no corpus-sized
    // single-partition window exists in the plan
    val plan = Sequences.qConcurrencyCurve(spark, sf)
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(b".r.findAllIn(plan).nonEmpty, plan)
  }

  test("dsir weights: provable target/raw separation on a hand-built corpus") {
    // en docs speak {x,y}, de docs speak {p,q}; the four bigram keys
    // hash to DISTINCT buckets mod 64 (15/39/29/52 — precomputed, no
    // collision), so the model is exactly computable by hand:
    //   T=8, R=16; en buckets c_t=c_r=4 → term = ⌊1000·log2(1·80/72)⌋ = 152
    //   de buckets c_t=0, c_r=4 → term = ⌊1000·log2((1/5)·80/72)⌋ = −2170
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-spec").toString
    Seq(
      (0L, "x y x y x", "en", "web", 9L),
      (1L, "x y x y x", "en", "web", 9L),
      (2L, "p q p q p", "de", "web", 9L),
      (3L, "p q p q p", "de", "web", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Selection.qDsirWeights(spark, dir).collect()
      .map(x => (x.getLong(0), x.getAs[Long]("n_feats"),
        x.getAs[Long]("dsir_milli"), x.getAs[Long]("sel")))
    spark.catalog.clearCache()
    assert(r.toSeq === Seq(
      (0L, 4L, 608L, 1L), (1L, 4L, 608L, 1L),
      (2L, 4L, -8680L, 0L), (3L, 4L, -8680L, 0L)), r.mkString(","))
    // and on the real fixture: deterministic, feats conserved
    val a = Selection.qDsirWeights(spark, sf).collect()
    val pairs = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .filter(size(split(col("text"), " ")) >= 2) // sequence(1,0) would descend
      .select(explode(expr(
        "filter(transform(sequence(1, size(split(text,' ')) - 1)," +
          " i -> struct(split(text,' ')[i-1], split(text,' ')[i]))," +
          " p -> length(p.col1) > 0 AND length(p.col2) > 0)")).as("p"))
      .count()
    assert(a.map(_.getAs[Long]("n_feats")).sum === pairs)
    assert(a.forall(x =>
      (x.getAs[Long]("dsir_milli") >= 0) === (x.getAs[Long]("sel") == 1L)))
  }

  test("sparse cosine: 5 lexical neighbors per probe, self excluded, sims ranked") {
    val rows = Relevance.qSparseCosine(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rs) =>
      assert(rs.length === 5)
      assert(rs.forall(_.getAs[Long]("doc_id") != qid))
      val sims = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("sim_micros"))
      assert(sims.toSeq === sims.toSeq.sorted.reverse)
    }
  }
}
