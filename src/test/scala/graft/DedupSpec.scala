package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Exactness of the prefix-filtered Jaccard join (AllPairs/PPJoin
  * lemma) on an ADVERSARIAL corpus: every document shares a hot run of
  * text (the shared-vocabulary failure mode the df-ordered prefix is
  * designed to survive), near-dup pairs exist at both high and
  * barely-over-threshold Jaccard, and decoys share ONLY the hot run.
  * The assertion is equality with an in-test brute-force all-pairs
  * join — the plan may prune candidates however it likes, the result
  * set may not change by one row. */
class DedupSpec extends SparkSpec {

  /** Brute-force reference: all-pairs gram intersection within
    * (source, blk), no prefiltering — the oracle's shape. */
  private def bruteForce(docs: DataFrame): DataFrame = {
    val g = docs.select(
        col("doc_id"), col("source"), expr("n_chars div 100").as("blk"), col("text"),
        explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1)), lit(4))).as("i"))
      .select(col("doc_id"), col("source"), col("blk"),
              xxhash64(expr("substr(text, i, 8)")).as("gram"))
      .distinct()
    val sz = g.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = g.as("a")
      .join(g.as("b"),
        col("a.source") === col("b.source") && col("a.blk") === col("b.blk") &&
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .agg(count(lit(1)).as("inter_n"))
    inter
      .join(sz.as("sa"), col("a") === col("sa.doc_id"))
      .join(sz.as("sb"), col("b") === col("sb.doc_id"))
      .filter(col("inter_n") * 10 >= col("sa.n") + col("sb.n") - col("inter_n"))
      .select(col("a"), col("b"), col("inter_n"),
        (col("sa.n") + col("sb.n") - col("inter_n")).as("union_n"))
      .orderBy("a", "b")
  }

  test("prefix-filtered ngram Jaccard equals brute force on a hot-gram corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def randText(n: Int): String =
      (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // every doc starts with the same hot 80-char run — in a naive
    // inverted-index join these grams alone produce all-pairs
    val hot = "thequickbrownfoxjumpsoverthelazydogandthenrunsstraightbackhomeagainatspeed!!"
    val base = (0 until 40).map(i => (i.toLong, hot + randText(160)))
    // near-identical dup of doc 0 (J ~ 0.97)
    val nearDup = Seq((100L, base(0)._2.dropRight(4) + "zzzz"))
    // borderline pair: docs 101/102 share the hot run + ~35% of tail
    val sharedTail = randText(60)
    val borderline = Seq(
      (101L, hot + sharedTail + randText(100)),
      (102L, hot + sharedTail + randText(100)))
    val rows = (base ++ nearDup ++ borderline)
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
    val docs = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-dedup-spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val expected = bruteForce(Tables.documents(spark, dir)).collect().toSeq
    val actual = Dedup.qNgramJaccard(spark, dir).collect().toSeq
    spark.catalog.clearCache()
    assert(expected.nonEmpty, "fixture must produce at least one qualifying pair")
    assert(actual == expected)
  }

  /** Brute-force ordered containment: all ordered same-source pairs,
    * no prefix filtering — the oracle's shape. */
  private def bruteForceContainment(docs: DataFrame): DataFrame = {
    val g = docs.select(
        col("doc_id"), col("source"), col("text"),
        explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1)), lit(4))).as("i"))
      .select(col("doc_id"), col("source"),
              xxhash64(expr("substr(text, i, 8)")).as("gram"))
      .distinct()
    val sz = g.groupBy("doc_id").agg(count(lit(1)).as("n"))
    g.as("a")
      .join(g.as("b"),
        col("a.source") === col("b.source") && col("a.gram") === col("b.gram") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .agg(count(lit(1)).as("inter_n"))
      .join(sz.withColumnRenamed("doc_id", "a"), "a")
      .filter(col("inter_n") * 5 >= col("n") * 4)
      .select(col("a"), col("b"), col("inter_n"), col("n").as("na"),
        expr("(inter_n * 100) div n").as("cont_pct"))
      .orderBy("a", "b")
  }

  test("prefix-index containment equals brute force incl. cross-length embeds") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def randText(n: Int): String =
      (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val hot = "thequickbrownfoxjumpsoverthelazydogandthenrunsstraightbackhomeagainatspeed!!"
    val base = (0 until 30).map(i => (i.toLong, hot + randText(160)))
    // doc 200 fully embedded at offset 0 of a 4x longer doc 201 (the
    // cross-length pair Jaccard's length blocking can never see)
    val small = hot + randText(80)
    val embeds = Seq((200L, small), (201L, small + randText(480)))
    val rows = (base ++ embeds)
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
    val docs = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-cont-spec").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val expected = bruteForceContainment(Tables.documents(spark, dir)).collect().toSeq
    val actual = Dedup.qNgramContainment(spark, dir).collect().toSeq
    spark.catalog.clearCache()
    assert(expected.exists(r => r.getLong(0) == 200L && r.getLong(1) == 201L),
      "fixture must contain the embedded cross-length pair")
    assert(actual == expected)
  }

  test("edit neardup equals naive levenshtein join; false candidates filtered") {
    import org.apache.spark.sql.functions._
    // hand vocabulary: cat~bat~cut (subst), cat~cats (insert),
    // ab~ba shares deletion variants but is distance 2 (must be
    // candidate-generated AND verify-filtered), xyz is isolated
    val dir = java.nio.file.Files.createTempDirectory("graft-edit-spec").toString
    import spark.implicits._
    Seq((0L, "cat bat cut cats ab ba xyz", "en", "web", 26L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.qEditNeardup(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    spark.catalog.clearCache()
    assert(got === Seq(
      ("ba", "bat", 1L), // insertion neighbor — ba gains a t
      ("bat", "cat", 1L), ("cat", "cats", 1L), ("cat", "cut", 1L)), got)
    assert(!got.exists(p => p._1 == "ab" && p._2 == "ba"),
      "shared-deletion pair at distance 2 must be verify-filtered")
    // fixture: blocked result equals the naive quadratic join
    val sf = "/root/testdata/sf0.001"
    val vocab = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct().localCheckpoint()
    val naive = vocab.as("a").join(vocab.as("b"), col("a.w") < col("b.w"))
      .select(col("a.w").as("a"), col("b.w").as("b"),
        levenshtein(col("a.w"), col("b.w")).cast("long").as("dist"))
      .filter(col("dist") <= 1).orderBy("a", "b").collect().map(_.toString).toSeq
    val blocked = Dedup.qEditNeardup(spark, sf).collect().map(_.toString).toSeq
    assert(blocked === naive)
    // and the plan must be the blocked equi-join, not a quadratic one
    val plan = Dedup.qEditNeardup(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("simhash sweep equals the naive quadratic hamming histogram (pigeonhole lossless)") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val blocked = Dedup.qSimhashSweep(spark, sf).collect()
      .map(r => (r.getAs[Long]("hamming"), r.getAs[Long]("n_pairs"))).toSeq
    val sig = Dedup.simhashSignatures(
      Tables.documents(spark, sf).select("doc_id", "text")).localCheckpoint()
    val naive = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= 3)
      .groupBy("hamming").agg(count(lit(1)).as("n_pairs"))
      .orderBy("hamming").collect()
      .map(r => (r.getAs[Long]("hamming"), r.getAs[Long]("n_pairs"))).toSeq
    assert(blocked === naive, s"blocked=$blocked naive=$naive")
    // the engine side must plan the piece equi-join, never all-pairs
    val plan = Dedup.qSimhashSweep(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
