package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, SignLsh, Similarity}

/** 10×-sf0.1 stress run of the dedup/ANN family (the one measured data
  * point beyond sf0.1 that the 100×-scale design claims rest on).
  *
  * Fixtures are DETERMINISTIC (fixed seeds) and adversarially skewed:
  *
  *  - documents: 50,000 rows (sf0.1 has 5,000) — one EXACT-duplicate
  *    "boilerplate" family of 400 docs (the hot band bucket: 79,800
  *    intra pairs that would land on one reducer unsalted), 300
  *    near-dup families of 8 (single fixed-width word substitutions, so
  *    shingle alignment survives and Jaccard stays ≥ ~0.9), and 47,200
  *    unique fillers over a shared 1,000-word vocabulary.
  *  - embeddings: 20,000 vectors (sf0.1 has 2,000) — one Gaussian
  *    cluster holding 30% of the corpus (IVF cell-skew driver), 15
  *    clusters sharing the rest, and 500 planted twin pairs at cosine
  *    ≈ 0.999 (sign-LSH recall ground truth).
  *
  * Invariants are the ones that break first at scale: recall against
  * planted structure (not just "returns rows"), and work-distribution
  * bounds on the hot keys (salt cells / bucket occupancy / IVF cell
  * sizes). Everything runs through the production entry points —
  * [[Dedup.minhashCandidatePairs]], [[Dedup.minhashComponents]],
  * [[SignLsh.neardup]], [[Similarity.buildIvfIndex]]/[[Similarity.ivfTopk]]
  * — against a written parquet dir, exactly as the driver runs them.
  */
class StressSpec extends SparkSpec {

  private val HotSize = 400
  private val MidFamilies = 300
  private val MidSize = 8
  private val NDocs = 50000
  private val NVecs = 20000
  private val Dim = 64
  private val PlantedPairs = 500

  // fixed-width 6-char tokens: a substitution never shifts the stride-5
  // shingle grid, so a 1-word edit perturbs ~3 of ~84 shingles
  private def tok(r: scala.util.Random): String = f"t${r.nextInt(100000)}%05d"
  private def sentence(r: scala.util.Random, n: Int): Array[String] =
    Array.fill(n)(tok(r))

  /** doc_id ranges: hot [0,400); family f member m = 1000 + f*10 + m;
    * fillers from 100000. */
  private lazy val docsDir: String = {
    val dir = Files.createTempDirectory(Paths.get("target"), "stress").toString
    val r = new scala.util.Random(20260813L)
    val hotTemplate = sentence(r, 60).mkString(" ")
    val hot = (0 until HotSize).map(i => (i.toLong, hotTemplate))
    val mid = (0 until MidFamilies).flatMap { f =>
      val template = sentence(r, 60)
      (0 until MidSize).map { m =>
        val words = template.clone()
        words((m * 7) % 60) = tok(r) // one fixed-width substitution
        (1000L + f * 10 + m, words.mkString(" "))
      }
    }
    val nFill = NDocs - HotSize - MidFamilies * MidSize
    val fill = (0 until nFill).map { i =>
      (100000L + i, sentence(r, 40 + r.nextInt(40)).mkString(" "))
    }
    import spark.implicits._
    (hot ++ mid ++ fill).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("stress"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.invalidate(dir) // contract: a rewritten path must be re-read
    dir
  }

  /** vec_id ranges: planted bases [0,500), twins [500,1000); hot cluster
    * [1000,7000); 15 tail clusters fill to 20,000. Unit-norm centers
    * with σ=0.3 noise keep same-cluster cosine ≈ 0.15 — below any
    * near-dup threshold, so only the planted twins are true pairs. */
  private lazy val embDir: String = {
    val r = new scala.util.Random(777L)
    def gauss(n: Int): Array[Float] = Array.fill(n)(r.nextGaussian().toFloat)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def member(c: Array[Float]): Seq[Float] =
      c.zip(gauss(Dim)).map { case (x, g) => x + 0.3f * g }.toSeq
    val centers = Array.fill(16)(unit(gauss(Dim)))
    val bases = (0 until PlantedPairs).map { i =>
      (i.toLong, member(centers(i % 16)), i % 16)
    }
    val twins = bases.map { case (id, e, lb) =>
      (id + PlantedPairs, e.zip(gauss(Dim)).map { case (x, g) => x + 0.01f * g }, lb)
    }
    val hot = (0 until 6000).map(i => (1000L + i, member(centers(0)), 0))
    val nTail = NVecs - 1000 - 6000
    val tail = (0 until nTail).map { i =>
      val c = 1 + i % 15
      (7000L + i, member(centers(c)), c)
    }
    import spark.implicits._
    val dir = Files.createTempDirectory(Paths.get("target"), "stress-emb").toString
    (bases ++ twins ++ hot ++ tail).toDF("vec_id", "embedding", "label")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    Tables.invalidate(dir)
    dir
  }

  /** Skew's salt: pmod(murmur3(id, seed=42), buckets). */
  private def salt(id: Long, buckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(id, org.apache.spark.sql.types.LongType, 42).toInt
    ((h % buckets) + buckets) % buckets
  }

  test("task-skew telemetry at 10×: no heavy stage runs max/mean > 8 (PERF.md section)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    import scala.collection.concurrent.TrieMap
    import scala.collection.mutable.ArrayBuffer
    // per-stage successful-task durations, straight off the scheduler —
    // the same signal a cluster UI aggregates; this is the measured
    // form of the salt/bucket invariants above (a hot key that dodged
    // them would surface here as one straggler task)
    val stages = TrieMap.empty[Int, ArrayBuffer[Long]]
    val listener = new SparkListener {
      // listener-bus events arrive on one dispatch thread; plain append
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null && t.taskInfo.successful)
          stages.getOrElseUpdate(t.stageId, ArrayBuffer.empty) += t.taskInfo.duration
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      Dedup.minhashCandidatePairs(spark, docsDir).count()
      val emb = Tables.embeddings(spark, embDir)
      val p = SignLsh.paramsFor(NVecs.toLong, 0.8, recall = 0.9,
        targetBucket = 8, seed = 42L)
      SignLsh.neardup(emb, p, 0.8).count()
      val (centroids, assignments) = Similarity.buildIvfIndex(emb, k = 32, iters = 2)
      Similarity.ivfTopk(emb.limit(16), emb, centroids, assignments,
        topK = 10, nprobe = 4).count()
      // the listener bus drains asynchronously; poll until the task
      // counts stop moving instead of sleeping a fixed guess
      var last = -1; var same = 0
      while (same < 3) {
        val now = stages.values.map(_.size).sum
        if (now == last) same += 1 else { same = 0; last = now }
        Thread.sleep(200)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // judge a stage only when skew could matter: enough tasks to skew
    // across and enough total work to hide a hot key (tiny stages are
    // all jitter — a 40 ms max over a 5 ms mean is scheduling noise)
    val heavy = stages.toSeq.flatMap { case (sid, durs) =>
      val n = durs.size
      val total = durs.sum
      // 500 ms floor: high enough to skip pure-jitter stages, low
      // enough that a warm full-suite run (page cache + codegen hot)
      // still yields judgeable stages
      if (n >= 8 && total >= 500L) {
        val mean = total.toDouble / n
        Some((sid, n, mean, durs.max.toDouble, durs.max / mean))
      } else None
    }.sortBy(-_._5)
    assert(heavy.nonEmpty, "no stage was heavy enough to judge — fixture shrank?")
    val report = heavy.map { case (sid, n, mean, mx, ratio) =>
      f"stage $sid%4d: tasks=$n%3d mean=${mean / 1000}%.2fs max=${mx / 1000}%.2fs ratio=$ratio%.1f"
    }.mkString("\n")
    info(s"per-stage task skew on the 10x corpus:\n$report")
    java.nio.file.Files.write(
      java.nio.file.Paths.get("target", "stress_skew.txt"),
      (report + "\n").getBytes("UTF-8"))
    heavy.foreach { case (sid, n, mean, mx, ratio) =>
      assert(ratio <= 8.0,
        f"stage $sid (tasks=$n, mean=${mean / 1000}%.2fs) has a ${mx / 1000}%.2fs straggler — hot-key skew")
    }
  }

  test("minhash-LSH at 10×: exact-dup recall 1.0, near-dup recall ≥ 0.75, hot family spread over salt cells") {
    val cand = Dedup.minhashCandidatePairs(spark, docsDir)
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
    // the hot family is 400 IDENTICAL texts: identical signatures share
    // every band key, so all 79,800 pairs MUST be candidates
    val hotTruth = (for {
      a <- 0L until HotSize.toLong; b <- (a + 1) until HotSize.toLong
    } yield (a, b)).toSet
    assert(hotTruth.subsetOf(cand),
      s"missing ${hotTruth.diff(cand).size} of ${hotTruth.size} exact-dup pairs")
    // near-dup families: 1-2 word edits → shingle Jaccard ≈ 0.9 → a
    // 2-band×4-row scheme fires per pair w.p. ≈ 1-(1-0.9⁴)² ≈ 0.88
    val midTruth = (for {
      f <- 0 until MidFamilies
      a <- 0 until MidSize; b <- (a + 1) until MidSize
    } yield (1000L + f * 10 + a, 1000L + f * 10 + b)).toSet
    val midRecall = cand.intersect(midTruth).size.toDouble / midTruth.size
    assert(midRecall >= 0.75, s"near-dup family recall $midRecall < 0.75")
    // false-positive bound: candidates touching no planted family are
    // chance 4×32-bit band-key collisions — a flood means the banding
    // or hashing is broken
    val planted = (0L until HotSize.toLong).toSet ++ midTruth.flatMap(p => Set(p._1, p._2))
    val spurious = cand.count(p => !planted(p._1) && !planted(p._2))
    assert(spurious <= cand.size / 20, s"$spurious spurious pairs of ${cand.size}")
    // task-skew invariant: the hot bucket's quadratic pair work reaches
    // every triangle salt cell, no cell holds a majority (unsalted: one
    // reducer holds 100%)
    val g = 4 // buckets used by candidatePairsFromKeys
    val cells = hotTruth
      .groupBy { case (a, b) =>
        (math.min(salt(a, g), salt(b, g)), math.max(salt(a, g), salt(b, g))) }
      .map(_._2.size)
    assert(cells.size == g * (g + 1) / 2, s"only ${cells.size} salt cells hit")
    assert(cells.max < hotTruth.size / 2,
      s"one salt cell holds ${cells.max} of ${hotTruth.size} hot pairs")
  }

  test("components at 10×: hot family is one exact component, near-dup families stay intact") {
    val labels = Dedup.minhashComponents(spark, docsDir)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    // the 400 exact dups form one component labeled by their min id (0)
    val hotIds = (0L until HotSize.toLong)
    assert(hotIds.forall(id => labels.get(id).contains(0L)),
      "exact-dup family not labeled by its minimum id")
    // no filler leaked INTO the hot component (a chance band-key
    // collision with the template would show up here)
    val hotComp = labels.collect { case (id, l) if l == 0L => id }
    assert(hotComp.size == HotSize, s"hot component size ${hotComp.size} != $HotSize")
    // near-dup families: members that appear in the candidate graph
    // must resolve to a label INSIDE their own family (families must
    // never merge with each other through a filler bridge)
    (0 until MidFamilies).foreach { f =>
      val ids = (0 until MidSize).map(m => 1000L + f * 10 + m)
      val famLabels = ids.flatMap(labels.get).distinct
      famLabels.foreach { l =>
        assert(ids.contains(l), s"family $f labeled $l — merged across families")
      }
    }
  }

  test("sign-LSH at 10×: planted-twin recall ≥ 0.9, candidate volume linear, buckets balanced") {
    val emb = Tables.embeddings(spark, embDir)
    val t = 0.8
    val p = SignLsh.paramsFor(NVecs.toLong, t, recall = 0.9, targetBucket = 8, seed = 42L)
    // bucket bound BEFORE pairing: a 30% Gaussian cluster legitimately
    // concentrates buckets (members co-sign every high-margin
    // hyperplane — measured ~190 on a 4.9 uniform expectation), so the
    // invariant is structural, not Poisson-tight: no bucket collapses
    // toward corpus scale, and no band's within-bucket pair work goes
    // quadratic (the two failure modes that melt a reducer at 100 TB)
    val bucketSizes = SignLsh.signatures(emb, p)
      .groupBy("band", "key").count().localCheckpoint()
    val sizes = bucketSizes.select("count").collect().map(_.getLong(0))
    assert(sizes.max <= NVecs / 50,
      s"hot bucket ${sizes.max} holds >2% of the corpus — bucket collapse")
    val worstBandPairs = bucketSizes
      .groupBy("band")
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")).as("pairs"))
      .select(max("pairs")).collect().head.getLong(0)
    assert(worstBandPairs < NVecs.toLong * NVecs / 20,
      s"a band does near-quadratic pairing: $worstBandPairs")
    val found = SignLsh.neardup(emb, p, t)
      .select("a", "b").collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    val planted = (0L until PlantedPairs.toLong)
      .map(i => (i, i + PlantedPairs)).toSet
    val recall = found.intersect(planted).size.toDouble / planted.size
    assert(recall >= 0.9, s"planted-twin recall $recall < 0.9")
    // candidate volume stays ~n·targetBucket·bands/2 (linear in n),
    // never quadratic: the verified output is a fortiori smaller
    assert(found.size < NVecs.toLong * 60,
      s"${found.size} verified pairs — near-quadratic blowup")
  }

  test("IVF at 10×: hash-spread seeds split the 30% hot cluster, recall ≥ 0.5 vs brute force") {
    val emb = Tables.embeddings(spark, embDir)
    val (centroids, assignments) = Similarity.buildIvfIndex(emb, k = 32, iters = 2)
    assert(centroids.count() == 32)
    assert(assignments.count() == NVecs.toLong)
    // cell-skew invariant: 30% of the corpus sits in ONE Gaussian
    // cluster; hash-spread seeding lands ~10 of 32 seeds inside it, so
    // no Voronoi cell may remain a catch-all
    val cellSizes = assignments.groupBy("cid").count()
      .select("count").collect().map(_.getLong(0))
    assert(cellSizes.max <= (NVecs * 0.2).toLong,
      s"largest IVF cell ${cellSizes.max} > 20% of corpus — catch-all cell")
    // recall vs brute force on a mixed query sample (planted bases,
    // hot-cluster members, tail-cluster members)
    val qids = (0L until 5L) ++ (1000L until 1005L) ++ (7000L until 7005L)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
    val ivf = Similarity.ivfTopk(queries, emb, centroids, assignments, topK = 10, nprobe = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.cosineTopkFloat(queries, emb, 10)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall@10 $recall < 0.5 (nprobe=4 of 32)")
    // a planted base's twin (cosine ≈ 0.999) must never be lost to
    // bucketing: same cell with near-certainty
    val twinHits = (0L until 5L).count(q => ivf.contains((q, q + PlantedPairs)))
    assert(twinHits >= 4, s"only $twinHits/5 planted twins survived IVF probing")
  }

  test("corpus-hygiene family at 10×: winnowing finds the planted families, unigram surprisal orders hot < filler") {
    import graft.operators.CorpusOps
    // winnowing: the 400 identical hot docs share their ENTIRE
    // fingerprint set, so the top shared fingerprints must each cover
    // (at least) the full family — the ≥6-word guarantee at 10× scale
    val fps = CorpusOps.qWinnowing(spark, docsDir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(fps.nonEmpty)
    assert(fps.head._2 >= HotSize.toLong,
      s"top shared fingerprint covers ${fps.head._2} docs < hot family $HotSize")
    assert(fps.forall(_._2 >= 2L))
    // unigram LM: hot-template words occur ≥400× each, filler words are
    // drawn from a 100k-token space — surprisal must rank hot docs well
    // below fillers (the quality-signal property the operator exists for)
    val bpt = CorpusOps.qUnigramPpl(spark, docsDir)
      .select("doc_id", "bpt_milli").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val hotBpt = bpt.collect { case (id, b) if id < HotSize => b }
    val fillBpt = bpt.collect { case (id, b) if id >= 100000L => b }
    assert(hotBpt.length == HotSize && fillBpt.nonEmpty)
    assert(hotBpt.max < fillBpt.sum / fillBpt.length,
      s"hot-doc max bpt ${hotBpt.max} not below filler mean ${fillBpt.sum / fillBpt.length}")
  }

  test("substring spans + gram novelty at 10×: hot family fully spanned except its corpus-first, novelty follows corpus order") {
    import graft.operators.CorpusOps
    // r9 canary: the pre-rewrite HOF formulation took 853 s at 5k docs
    // (and would be >2 h here); the explode+lead pipelines must stay
    // seconds-scale at 50k. The bound is deliberately loose — it only
    // fires on a complexity-class regression, not host noise.
    val t0 = System.nanoTime()
    val spans = CorpusOps.qSubstringSpans(spark, docsDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val novelty = CorpusOps.qGramNovelty(spark, docsDir).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val wall = (System.nanoTime() - t0) / 1e9
    assert(wall < 120.0, f"spans+novelty at 10x took $wall%.1f s — complexity regression")
    // doc 0 is the hot family's corpus-first occurrence: zero spans,
    // full novelty; docs 1-399 are byte-identical restatements: fully
    // spanned (every word inside a duplicated 8-gram window), zero
    // novelty
    assert(spans(0L) === ((0L, 0L, 60L, 0L)))
    (1L until HotSize.toLong).foreach { id =>
      val (n, dup, words, frac) = spans(id)
      assert(n == 1L && dup == 60L && words == 60L && frac == 1000L,
        s"hot doc $id not fully spanned: ($n, $dup, $words, $frac)")
      assert(novelty(id) == 0L, s"hot doc $id novelty ${novelty(id)} != 0")
    }
    assert(novelty(0L) == 1000L)
    // near-dup family: one substituted word per member leaves long
    // duplicated runs vs the family's first member — every later member
    // must be majority-spanned but NOT fully (its substitution site and
    // the first member's differ)
    val famLater = (0 until MidFamilies).flatMap(f =>
      (1 until MidSize).map(m => 1000L + f * 10 + m))
    famLater.foreach { id =>
      val frac = spans(id)._4
      assert(frac > 500L && frac < 1000L,
        s"family member $id dup_frac_milli $frac outside (500, 1000)")
    }
  }

}
