package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{SignLsh, Similarity, Skew}

/** Scale-path operators: IVF ANN recall, salted aggregation/join
  * equivalence, bucketed co-located join (no Exchange in the plan). */
class ScaleSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("IVF index: assignments cover corpus; topk recall vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val (centroids, assignments) = Similarity.buildIvfIndex(emb, k = 8, iters = 1)
    assert(centroids.count() == 8)
    assert(assignments.count() == emb.count())
    val queries = emb.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfTopk(queries, emb, centroids, assignments, topK = 5, nprobe = 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.cosineTopkFloat(queries, emb, 5)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall@5 with nprobe=3 of 8 buckets should recover a majority
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // and every query returns exactly topK candidates
    assert(ivf.groupBy(_._1).forall(_._2.size == 5))
  }

  test("salted aggregation == plain aggregation") {
    val li = Tables.lineitem(spark, sf)
    val plain = li.groupBy(col("l_returnflag").as("k"))
      .agg(sum("l_quantity").as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(li, col("l_returnflag"), col("l_quantity"), 16)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(plain.keySet == salted.keySet)
    plain.foreach { case (k, (s, n)) =>
      assert(math.abs(salted(k)._1 - s) < 1e-6 && salted(k)._2 == n, s"key $k")
    }
  }

  test("salted join == plain join") {
    import spark.implicits._
    val big = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    val small = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = big.join(small, "l_orderkey").count()
    val salted = Skew.saltedJoin(big, small, "l_orderkey", 8).count()
    assert(plain == salted)
  }

  test("triangle-salted self-pairs: exact pair set on a hot key, work split across cells") {
    import spark.implicits._
    // one pathologically hot band bucket (500 ids) plus normal ones
    val rows = (0L until 500L).map(id => ("hot", id)) ++
      (0L until 40L).map(id => (s"cold_${id % 10}", 1000L + id))
    val df = rows.toDF("band_key", "doc_id")
    val g = 4
    val pairs = Skew.saltedSelfPairs(df, Seq("band_key"), "doc_id", g)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactness: every unordered same-key pair exactly once
    val expected = rows.groupBy(_._1).values.flatMap { grp =>
      val ids = grp.map(_._2)
      for (x <- ids; y <- ids if x < y) yield (x, y)
    }.toSet
    assert(pairs.length == expected.size, "a pair was dropped or duplicated")
    assert(pairs.toSet == expected)
    // balance: the hot key's quadratic work is spread over the
    // g(g+1)/2 salt cells — no cell (reducer) holds more than a
    // modest multiple of the ideal share, vs 100% unsalted
    def salt(id: Long): Int = {
      val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
        .hash(id, org.apache.spark.sql.types.LongType, 42).toInt
      ((h % g) + g) % g
    }
    val hotPairs = expected.filter(_._1 < 500)
    val cellCounts = hotPairs
      .groupBy { case (x, y) =>
        (math.min(salt(x), salt(y)), math.max(salt(x), salt(y))) }
      .map(_._2.size)
    val nCells = g * (g + 1) / 2
    assert(cellCounts.size == nCells, "hot key did not reach every salt cell")
    assert(cellCounts.max < hotPairs.size / 2,
      s"one cell holds ${cellCounts.max} of ${hotPairs.size} hot pairs")
  }

  // ---- parameterized sign-LSH (the scale path behind q_embedding_neardup)

  /** Brute-force ground truth: every unordered pair at float-cosine ≥ t.
    * Same zip_with/aggregate dot as the LSH verify stage, so doubles are
    * bitwise identical and set comparisons are exact. */
  private def bruteTruth(corpus: org.apache.spark.sql.DataFrame, t: Double): Set[(Long, Long)] = {
    def dotF(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val l = corpus.select(col("vec_id").as("a"), col("embedding").as("ae"))
    val r = corpus.select(col("vec_id").as("b"), col("embedding").as("be"))
    l.join(r, col("a") < col("b"))
      .filter(dotF(col("ae"), col("be")) /
        (sqrt(dotF(col("ae"), col("ae"))) * sqrt(dotF(col("be"), col("be")))) >= t)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
  }

  test("sign-LSH: paramsFor sizing meets its recall target vs brute force") {
    val emb = Tables.embeddings(spark, sf)
    val n = emb.count()
    val t = 0.3
    val p = SignLsh.paramsFor(n, t, recall = 0.9, targetBucket = 64, seed = 42L)
    // corpus-scaled bucket width: 500/64 → 3 bits, 8 buckets per band
    assert(p.bits == SignLsh.bitsFor(n, 64))
    val truth = bruteTruth(emb, t)
    assert(truth.nonEmpty, "fixture has no near-dup pairs at t=0.3")
    val found = SignLsh.neardup(emb, p, t)
      .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    // precision is 1 by construction (explicit verify stage)
    assert(found.subsetOf(truth), "LSH emitted a pair below the threshold")
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.85, s"recall $recall below sized-for target 0.9 (slack 0.05)")
  }

  test("sign-LSH: multiprobe recovers recall lost to fewer bands") {
    val emb = Tables.embeddings(spark, sf)
    val t = 0.3
    val truth = bruteTruth(emb, t)
    // deliberately under-banded: 3 bands instead of the sized ~10
    val lean = SignLsh.Params(bits = 3, bands = 3, seed = 42L, multiprobe = 0)
    val probed = lean.copy(multiprobe = 2)
    def recallOf(p: SignLsh.Params): Double = {
      val f = SignLsh.neardup(emb, p, t)
        .select("a", "b").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      f.intersect(truth).size.toDouble / truth.size
    }
    val r0 = recallOf(lean)
    val r1 = recallOf(probed)
    assert(r1 > r0, s"multiprobe did not improve recall: $r0 -> $r1")
  }

  test("sign-LSH: hot corpus stays bounded where coordinate-sign buckets collapse") {
    import spark.implicits._
    // adversarial corpus: first 8 coordinates all-positive (every vector
    // lands in coordinate-sign bucket "11111111" — the fixed-256-bucket
    // scheme degenerates to ONE bucket → n²/2 pairs on one reducer)
    val rnd = new scala.util.Random(7)
    val n = 1000
    val vecs = (0 until n).map { id =>
      (id.toLong, Seq.tabulate(64) { d =>
        if (d < 8) (rnd.nextDouble() * 2.0).toFloat
        else (rnd.nextGaussian()).toFloat
      })
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val signBkt = concat((1 to 8).map(i =>
      when(element_at(col("embedding"), i) >= 0f, lit("1")).otherwise(lit("0"))): _*)
    assert(corpus.select(signBkt).distinct().count() == 1,
      "fixture should collapse the coordinate-sign scheme to one bucket")
    // seeded random hyperplanes spread the same corpus
    val p = SignLsh.paramsFor(n, 0.3, recall = 0.9, targetBucket = 64, seed = 42L)
    val sizes = SignLsh.signatures(corpus, p)
      .groupBy("band", "key").count()
      .select("count").collect().map(_.getLong(0))
    val expectedOccupancy = n.toDouble / (1L << p.bits)
    assert(sizes.max <= (4 * expectedOccupancy).toLong,
      s"hot bucket: max ${sizes.max} vs expected ~$expectedOccupancy")
    // within-bucket pair work is linear in n, not quadratic: the worst
    // band's pair count is far below the single-bucket n²/2 collapse
    val worstBandPairs = SignLsh.signatures(corpus, p)
      .groupBy("band", "key").count()
      .groupBy("band").agg(sum((col("count") * (col("count") - 1) / 2).cast("long")).as("pairs"))
      .select(max("pairs")).collect().head.getLong(0)
    assert(worstBandPairs < n.toLong * n / 8,
      s"a band still does near-quadratic pairing: $worstBandPairs")
  }

  test("FloatDotExpr: bit-identical to the zip_with/aggregate fold, runs codegen") {
    val emb = Tables.embeddings(spark, sf)
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("v2"), col("embedding").as("b")))
    val both = pairs.select(
      graft.operators.Similarity.dotFloat(col("a"), col("b")).as("fast"),
      hof.as("slow"))
    // exact double equality on every pair (same multiply/accumulate order)
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
    // and the expression participates in whole-stage codegen over a
    // real parquet scan when not co-projected with interpreted HOFs
    // (AQE finalizes the plan only after execution)
    val fastOnly = pairs.select(
      graft.operators.Similarity.dotFloat(col("a"), col("b")).as("fast"))
    fastOnly.collect()
    val plan = fastOnly.queryExecution.executedPlan.toString
    // the '*(n)' prefix is the WholeStageCodegen marker in tree strings
    assert(plan.contains("*(") && plan.contains("float_dot"), plan.take(800))
    assert(
      plan.linesIterator.exists(l => l.contains("float_dot") && l.contains("*(")),
      s"float_dot Project not inside a codegen span:\n${plan.take(800)}")
  }

  test("sign-LSH: bucket count scales with the corpus (pure sizing)") {
    assert(SignLsh.bitsFor(1000000000L, 1024) == 20)      // 1B vecs → 2^20 buckets
    assert(SignLsh.bitsFor(500, 1024) == 1)               // tiny corpus → no over-split
    assert(SignLsh.bandsFor(3, 0.3, 0.9) >= 8)            // low threshold needs bands
    assert(SignLsh.bandsFor(3, 0.9, 0.9) <= 3)            // high threshold needs few
    val p = SignLsh.collisionP(0.3)
    assert(math.abs(p - (1 - math.acos(0.3) / math.Pi)) < 1e-12)
  }

  test("bucketed tables join without a shuffle Exchange") {
    val wh = Files.createTempDirectory(Paths.get("target"), "warehouse")
    val s2 = spark.newSession() // warehouse.dir is static; use explicit paths
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    val li = Tables.lineitem(s2, sf)
    val ord = Tables.orders(s2, sf)
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    ord.withColumnRenamed("o_orderkey", "l_orderkey")
      .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")
    val joined = s2.table("li_b").join(s2.table("ord_b"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located bucketed join: SortMergeJoin with NO shuffle exchange
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected shuffle in bucketed join plan:\n$plan")
    assert(joined.count() > 0)
    s2.sql("DROP TABLE IF EXISTS li_b")
    s2.sql("DROP TABLE IF EXISTS ord_b")
  }

  test("large/small-star at adversarial scale: 100k edges, long path + high fanout") {
    import graft.operators.Dedup
    import spark.implicits._
    // the two shapes that break naive propagation, at spec-meaningful
    // size: a 50k-edge path (diameter 50k — O(n) rounds for plain
    // label propagation) and a 30k-leaf star hub (max fanout — the
    // groupBy("u") hot key), plus 20k seeded random edges over a 60k-id
    // block forming many mid-size components
    val path = spark.range(0L, 50000L).select(col("id").as("a"), (col("id") + 1).as("b"))
    val star = spark.range(100001L, 130001L).select(lit(100000L).as("a"), col("id").as("b"))
    val rnd = new scala.util.Random(13)
    val random = (1 to 20000)
      .map(_ => (200000L + rnd.nextInt(60000), 200000L + rnd.nextInt(60000)))
      .toDF("a", "b")
    val edges = path.unionAll(star).unionAll(random).localCheckpoint()
    val nEdges = edges.count()
    assert(nEdges >= 100000L, s"fixture too small: $nEdges edges")

    val (labelsDf, rounds) = Dedup.componentsLargeSmallStar(edges)
    // O(log n), not O(diameter): 2·log2(50001) ≈ 31 vs ~50k propagation
    // rounds on the path alone
    assert(rounds <= 32, s"took $rounds rounds — not O(log n)")

    val labels = labelsDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.collect().foreach { row =>
        val (a, b) = (row.getLong(0), row.getLong(1))
        if (a != b) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
      labels.keys.map(x => x -> find(x)).toMap
    }
    assert(labels == want, "star labels diverge from union-find ground truth")
  }

  test("k-center coreset: greedy picks replay on a hand geometry; invariants hold") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory(Paths.get("target"), "kcenter").toString
    import spark.implicits._
    def v(hot: Map[Int, Float]): Seq[Float] =
      (0 until 64).map(i => hot.getOrElse(i, 0.0f))
    // origin + axis points with hand-computable squared distances
    val rows = Seq(
      (1L, v(Map.empty)),            // c0 (min vec_id)
      (2L, v(Map(0 -> 3.0f))),       // d²(·,1)=9
      (3L, v(Map(1 -> 4.0f))),       // 16 → pick 1
      (4L, v(Map(0 -> 1.0f, 1 -> 1.0f))), // 2
      (5L, v(Map(2 -> 2.0f))),       // 4
      (6L, v(Map(0 -> 3.0f, 1 -> 0.1f))), // ~9.01 near vec 2
      (7L, v(Map(3 -> 0.5f))))       // 0.25
      .map { case (i, e) => (i, e, 0) }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = graft.operators.Similarity.qKcenterCoreset(spark, dir).collect()
    assert(r.map(_.getAs[Long]("ord")).toSeq === (0L to 5L))
    val picks = r.map(_.getAs[Long]("vec_id")).toSeq
    assert(picks.head === 1L)
    assert(picks(1) === 3L) // farthest from origin (16)
    assert(picks.distinct.length === 6, "picks must not repeat")
    // greedy invariant: selection distances non-increasing after ord 0;
    // final cover ≤ the last selection distance. Distances leave on the
    // ×10¹⁶ integer grid as BIGINT (no-DECIMAL-output contract).
    val d2 = r.map(_.getAs[Long]("d2_sel_e16"))
    assert(d2(1) === 16L * 10000000000000000L, "d²(origin, vec 3) = 16 on the e16 grid")
    (2 until 6).foreach(i => assert(d2(i) <= d2(i - 1),
      s"d2_sel_e16 must be non-increasing at $i"))
    val cover = r.head.getAs[Long]("d2_cover_e16")
    assert(cover <= d2(5))
    assert(r.map(_.getAs[Long]("d2_cover_e16")).distinct.length === 1)
  }

  test("k-center coreset: fewer than K eligible vectors -> empty frame, not a crash") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory(Paths.get("target"), "kcenter-small").toString
    import spark.implicits._
    def v(hot: Map[Int, Float]): Seq[Float] =
      (0 until 64).map(i => hot.getOrElse(i, 0.0f))
    // 3 eligible vectors (< K = 6) plus one filtered out by the len-64 gate
    val rows = Seq(
      (1L, v(Map.empty), 0), (2L, v(Map(0 -> 1.0f)), 0),
      (3L, v(Map(1 -> 1.0f)), 0), (4L, Seq(1.0f, 2.0f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = graft.operators.Similarity.qKcenterCoreset(spark, dir)
    assert(r.columns.toSeq ===
      Seq("ord", "vec_id", "d2_sel_e16", "d2_cover_e16"))
    assert(r.count() === 0L, "all-or-nothing: < K vectors must yield an empty frame")
  }

  test("k-center coreset: duplicate vec_ids count once toward K (row count would crash mid-loop)") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory(Paths.get("target"), "kcenter-dup").toString
    import spark.implicits._
    def v(hot: Map[Int, Float]): Seq[Float] =
      (0 until 64).map(i => hot.getOrElse(i, 0.0f))
    // 3 DISTINCT ids, each row duplicated -> 6 rows but only 3 pickable
    // centers: a row-count >= K guard would proceed and the pick loop's
    // argmax head() would throw at t = 3
    val rows = (1L to 3L).flatMap(i =>
      Seq.fill(2)((i, v(Map(i.toInt -> 1.0f)), 0)))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = graft.operators.Similarity.qKcenterCoreset(spark, dir)
    assert(r.count() === 0L,
      "3 distinct < K=6 must short-circuit to empty, mirroring the oracle's COUNT(DISTINCT)")
  }

  test("int8 recall: a hand-planted rounding flip crosses the k boundary; lossless queries stay 1000") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory(Paths.get("target"), "int8rec").toString
    import spark.implicits._
    def v(hot: Map[Int, Float]): Seq[Float] =
      (0 until 64).map(i => hot.getOrElse(i, 0.0f))
    // query 0 = e0. Exact IP order: v5 (.99) > v4 (.9005) > v3 = v6 (.9).
    // int8: v4's scale is dragged to 1.0 by its dim-2 component, so its
    // dim-0 quantizes to 114 (127·0.9005 rounds DOWN) while v3/v6 use
    // their own 0.9 scale and keep 127 — dequantized 114·1e8 < 127·0.9e8
    // drops v4 below BOTH, pushing it past k=3: truth {5,4,3}, approx
    // {5,3,6}, hits 2. Queries 1 and 2 are lossless (components are 0
    // or ±scale) → recall exactly 1000.
    val rows = Seq(
      (0L, v(Map(0 -> 1.0f))),                 // query of interest
      (1L, v(Map(1 -> 1.0f))),                 // lossless query
      (2L, v(Map(10 -> 1.0f))),                // lossless query
      (3L, v(Map(0 -> 0.9f, 1 -> 0.9f))),
      (4L, v(Map(0 -> 0.9005f, 2 -> 1.0f))),
      (5L, v(Map(0 -> 0.99f))),
      (6L, v(Map(0 -> 0.9f, 1 -> 0.9f))))      // exact tie with v3
      .map { case (i, e) => (i, e, 0) }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.Similarity.qInt8Recall(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_hits"),
        r.getAs[Long]("recall_permille"))).toMap
    assert(got === Map(0L -> ((2L, 666L)),
      1L -> ((3L, 1000L)), 2L -> ((3L, 1000L))))
  }
}
