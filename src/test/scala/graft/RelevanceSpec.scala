package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Relevance}

/** Semantics of the relevance/corpus-health operators on inline
  * fixtures (the sf oracle gate covers the testdata equivalence; these
  * pin the properties the gate can't see). */
class RelevanceSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String, String, Long)*) =
    rows.toDF("doc_id", "text", "source", "n_chars")

  private def writeFixture(rows: (Long, String, String, Long)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("relevance").toString
    docs(rows: _*)
      .select(col("doc_id"), col("text"),
        lit("en").as("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bm25: rarer terms score higher at equal tf and length") {
    // "scan" appears in 1 of 3 docs, "data" in all 3 → the scan doc
    // must outrank the data docs at identical tf and length.
    val dir = writeFixture(
      (1L, "data alpha beta", "s", 15L),
      (2L, "data gamma delta", "s", 16L),
      (3L, "scan alpha beta", "s", 15L))
    val r = Relevance.qBm25(spark, dir).select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(r(3L) > r(1L) && r(3L) > r(2L))
  }

  test("bm25: length normalization decays the score") {
    val filler = Seq.fill(50)("x").mkString(" ")
    val dir = writeFixture(
      (1L, "data", "s", 4L),
      (2L, s"data $filler", "s", 104L))
    val r = Relevance.qBm25(spark, dir).select("doc_id", "score").as[(Long, Long)].collect().toMap
    assert(r(1L) > r(2L))
  }

  test("sorted_neighbors: planted prefix twins surface, unrelated text does not") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val dir = writeFixture(
      (1L, s"$shared tail one two", "s", 40L),
      (2L, s"$shared other continuation", "s", 45L),
      (3L, s"$shared tail one two", "s", 40L), // exact dup of 1
      (4L, "completely different text here", "s", 30L))
    val r = Dedup.qSortedNeighbors(spark, dir)
      .select("doc_a", "doc_b", "lcp", "is_exact")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // sort order inside the block: doc1 == doc3 < doc2 ("other" < "tail"
    // is false: 'o' < 't') → adjacency (1,3) exact, then (3,2)? No:
    // sorted by (text, id) = [shared+" other…"(2), shared+" tail…"(1),
    // shared+" tail…"(3)] → pairs (2,1) and (1,3)
    assert(r.exists(p => p._1 == 1L && p._2 == 3L && p._4 == 1L))
    val pair21 = r.find(p => p._1 == 2L && p._2 == 1L)
    assert(pair21.nonEmpty && pair21.get._3 === shared.length.toLong + 1L)
    assert(!r.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("mad outliers: one extreme length is fenced, the bulk is not") {
    val bulk = (1L to 20L).map(i => (i, "t", "s", 100L + (i % 3)))
    val dir = writeFixture(bulk :+ ((99L, "t", "s", 100000L)): _*)
    val out = Relevance.qMadOutliers(spark, dir).select("doc_id").as[Long].collect()
    assert(out.toSeq == Seq(99L))
  }

  test("dup by source: exact duplicate counting per source") {
    val dir = writeFixture(
      (1L, "same text", "a", 9L), (2L, "same text", "a", 9L),
      (3L, "other", "a", 5L), (4L, "unique", "b", 6L))
    val r = Relevance.qDupBySource(spark, dir)
      .select("source", "n_docs", "n_uniq", "dup_rows").as[(String, Long, Long, Long)]
      .collect().toSet
    assert(r == Set(("a", 3L, 2L, 1L), ("b", 1L, 1L, 1L - 1L)))
  }

  test("containment: embedded doc is caught in both lengths' orientations, jaccard misses it") {
    // B = A plus a long unrelated tail: containment(A→B) ≈ 1 but
    // Jaccard(A,B) is small — the asymmetric operator's whole point.
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val tail = (1 to 30).map(i => s"filler$i word$i more$i").mkString(" ")
    val dir = writeFixture(
      (1L, a, "s", a.length.toLong),
      (2L, s"$a $tail", "s", (a.length + 1 + tail.length).toLong))
    val pairs = Dedup.qNgramContainment(spark, dir)
      .select("a", "b", "cont_pct").as[(Long, Long, Long)].collect()
    assert(pairs.exists { case (x, y, pct) => x == 1L && y == 2L && pct >= 80 })
    assert(!pairs.exists { case (x, y, _) => x == 2L && y == 1L }) // big doc not contained in small
    val jac = Dedup.qNgramJaccard(spark, dir).count()
    assert(jac == 0L) // same fixture, symmetric test blind to it
  }

  test("pmi: a bound pair outranks a frequent-but-independent pair") {
    import graft.operators.TextStats
    // "kuala lumpur" always co-occur (bound); "the cat/dog/sun/..." is
    // frequent but independent — PMI must rank the bound pair first
    // even though "the X" pairs are more frequent in total.
    val partners = Seq("cat", "dog", "sun", "sky", "map", "pen", "cup", "box")
    val docs = (1L to 8L).map { i =>
      val filler = partners.map(p => s"the $p").mkString(" ")
      (i, s"kuala lumpur $filler", "s", 1L)
    }
    val dir = writeFixture(docs: _*)
    val top = TextStats.qPmiBigrams(spark, dir)
      .select("w1", "w2").as[(String, String)].collect().head
    assert(top == ("kuala", "lumpur"))
  }

  test("type-token ratio: repetitive text scores below diverse text") {
    import graft.operators.TextStats
    val dir = writeFixture(
      (1L, Seq.fill(20)("spam").mkString(" "), "s", 99L),
      (2L, (1 to 20).map(i => s"word$i").mkString(" "), "s", 99L))
    val r = TextStats.qTypeTokenRatio(spark, dir)
      .select("doc_id", "ttr_pct").as[(Long, Long)].collect().toMap
    assert(r(1L) == 5L)   // 1 type / 20 tokens
    assert(r(2L) == 100L) // all distinct
  }

  test("dedup keep: one survivor per near-dup chain, singletons kept") {
    // Three shingle-identical copies (a transitive chain through LSH
    // bands) plus one unrelated doc: survivors = min-id of the chain +
    // the singleton.
    val near = "the quick brown fox jumps over the lazy dog again and again"
    val dir = writeFixture(
      (10L, near, "s", near.length.toLong),
      (11L, near, "s", near.length.toLong),
      (12L, near, "s", near.length.toLong),
      (20L, "completely unrelated content with different words entirely", "s", 58L))
    val kept = Dedup.qDedupKeep(spark, dir).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 20L))
  }

  test("rrf fusion: 3 per probe, scores ranked and bounded, consensus beats single") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.operators.Relevance.qRrfFusion(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size === 8)
    byQ.foreach { case (_, rs) =>
      assert(rs.length === 3)
      val scores = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("rrf_micros"))
      assert(scores.toSeq === scores.toSeq.sorted.reverse)
      // one channel at best rank contributes 1000000/61 = 16393;
      // two channels cap the score at 2x that
      assert(scores.forall(x => x > 0 && x <= 2 * 16393))
    }
    // any doc in BOTH channels outscores any doc in exactly one: the
    // worst two-channel score (ranks 3 and 5) beats the best single-
    // channel score (rank 1) because 1/63 + 1/65 > 1/61
    assert(1000000 / 63 + 1000000 / 65 > 1000000 / 61)
  }

  test("retrieval eval: probes conserved, metric bounds, MRR dominates P@1") {
    val sf = "/root/testdata/sf0.001"
    val r = graft.operators.Relevance.qRetrievalEval(spark, sf).collect()
    assert(r.nonEmpty)
    // every probe with a label lands in exactly one stratum
    assert(r.map(_.getAs[Long]("n_queries")).sum === 64L)
    r.foreach { x =>
      val p1 = x.getAs[Long]("p1_permille")
      val mrr = x.getAs[Long]("mrr_milli")
      assert(p1 >= 0 && p1 <= 1000)
      assert(mrr >= 0 && mrr <= 1000)
      // a rank-1 hit contributes 1000 to both sums; lower ranks only
      // add to MRR — so the MRR mean dominates the P@1 rate
      assert(mrr >= p1, s"mrr=$mrr p1=$p1")
    }
  }

  test("ndcg: planted relevance gives exact position-discounted scores") {
    // Probes are doc_id < 64; docs >= 64 are corpus-only.
    //  - q0 "alpha beta" (label 1): sole candidate 100 shares both
    //    words, is relevant, ranks 1 → DCG = 1e6; R = 1 → IDCG = 1e6
    //    → ndcg 1000, perfect.
    //  - q1 "gamma delta" (label 2): candidate 101 shares "gamma",
    //    ranks 1, relevant; 102 shares nothing (never retrieved) but
    //    counts in R = 2 → IDCG = 1630929 → ndcg = 1e9/1630929 = 613.
    val dir = java.nio.file.Files.createTempDirectory("ndcg").toString
    Seq((0L, "alpha beta", "s", 10L), (1L, "gamma delta", "s", 11L),
      (100L, "alpha beta", "s", 10L), (101L, "gamma epsilon", "s", 13L),
      (102L, "zeta eta", "s", 8L))
      .toDF("doc_id", "text", "source", "n_chars")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq((0L, Seq(0.1f), 1), (1L, Seq(0.1f), 2), (100L, Seq(0.1f), 1),
      (101L, Seq(0.1f), 2), (102L, Seq(0.1f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Relevance.qNdcg(spark, dir).collect()
      .map(x => x.getAs[Long]("label") ->
        ((x.getAs[Long]("n_queries"), x.getAs[Long]("avg_ndcg_permille"),
          x.getAs[Long]("n_perfect")))).toMap
    assert(r === Map(1L -> ((1L, 1000L, 1L)), 2L -> ((1L, 613L, 0L))))
  }

  test("ndcg: sf bounds — permille in range, perfect below query count") {
    val r = graft.operators.Relevance.qNdcg(spark, "/root/testdata/sf0.001").collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val a = x.getAs[Long]("avg_ndcg_permille")
      assert(a >= 0 && a <= 1000)
      assert(x.getAs[Long]("n_perfect") <= x.getAs[Long]("n_queries"))
    }
  }
}
