package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators._

/** Operator semantics on tiny in-memory data + the sf0.001 testdata
  * (shape checks only — value-exactness is the DuckDB oracle's job). */
class OperatorsSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("all declared queries run and return rows at sf0.001") {
    // queries where an empty result is legitimate at this tiny scale
    // (q_edit_neardup: the 31-word soup vocabulary has no distance-1
    // pairs — the naive-join spec proves empty is the CORRECT answer)
    val mayBeEmpty = Set("q_embedding_neardup", "q_ngram_jaccard", "q_edit_neardup")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0 && (mayBeEmpty.contains(name) || n > 0),
        s"$name returned $n rows")
    }
  }

  test("every query has an oracle twin (driver contract)") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("latest-per-group picks max event_id per group") {
    import spark.implicits._
    val df = Reports.qLatestPerGroup(spark, sf)
    val viaAgg = graft.Tables.events(spark, sf)
      .groupBy("event_type").agg(max("event_id").as("event_id"))
    val joined = df.join(viaAgg, Seq("event_id"), "left_anti")
    assert(joined.isEmpty)
  }

  test("first-wins dedup is deterministic: min event_id per key") {
    val df = Reports.qFirstWinsDedup(spark, sf)
    val viaAgg = graft.Tables.events(spark, sf)
      .groupBy("user_id", "event_type").agg(min("event_id").as("event_id"))
    assert(df.join(viaAgg, Seq("event_id"), "left_anti").isEmpty)
    assert(df.count() == viaAgg.count())
  }

  test("dedup exact: identical texts collapse to min doc_id") {
    import spark.implicits._
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val r = docs.groupBy("text")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dup_count"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(r("same text") == (1L, 2L))
    assert(r("other") == (3L, 1L))
  }

  test("minhash LSH: exact duplicate docs are always candidates") {
    import spark.implicits._
    // two identical docs + one unrelated; identical docs share ALL bands
    val base = graft.Tables.documents(spark, sf).limit(0) // schema only
    val docs = Seq(
      (900001L, "spark group query row data slow small filter the batch"),
      (900002L, "spark group query row data slow small filter the batch"),
      (900003L, "completely different words that share nothing at all xyzzy")
    ).toDF("doc_id", "text")
    // run the same plan as qDedupMinhashLsh but on this tiny df via temp view
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "mhdocs")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pairs = Dedup.qDedupMinhashLsh(spark, tmp.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((900001L, 900002L)))
    assert(!pairs.exists(p => p._1 == 900003L || p._2 == 900003L))
  }

  test("dedupCorpus: exact dups collapse, near-dup b-sides drop") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "corpus")
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact dup of 1
      (3L, "totally different content with other words entirely here xyz")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val kept = Dedup.dedupCorpus(spark, tmp.toString)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L)) // 2 dies twice over (exact + near)
  }

  test("statusJsonb projects the reference's jsonb writer shape (F7)") {
    import spark.implicits._
    val st = Seq(graft.crawl.StatusRow(1, new java.sql.Timestamp(1700000000000L),
      "file rate", 12.5, "files/sec")).toDF()
    val j = graft.crawl.Crawl.statusJsonb(st).collect().head
    assert(j.getLong(0) == 1L)
    val entry = j.getString(1)
    assert(entry.contains("\"status\":\"file rate\"") &&
           entry.contains("\"value\":12.5") &&
           entry.contains("\"time\":1700000000"))
  }

  test("simhash: identical docs get identical signatures") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "shdocs")
    Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val sig = Dedup.qDedupSimhash(spark, tmp.toString).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("cosineTopkFloat: nearest neighbor of a vector is its duplicate") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f)),   // duplicate of 1
      (3L, Array(0f, 1f, 0f)),
      (4L, Array(0.9f, 0.1f, 0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.cosineTopkFloat(vecs.filter(col("vec_id") === 1), vecs, 1)
      .collect()
    assert(top.length == 1 && top(0).getAs[Long]("nid") == 2L)
  }

  test("multimodal: stub feature extraction preserves batch shape") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Array[Byte](1, 2, 3, 4), "image/png", Some(2), Some(2), None),
      Multimodal.MediaRow(2L, "audio", Array[Byte](9, 9), "audio/wav", None, None, Some(100L))
    ).toDS()
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 2)
    val f1 = feats.find(_.media_id == 1L).get
    assert(f1.n_bytes == 4 && f1.feature.length == 8)
    // deterministic: same input → same checksum
    val again = Multimodal.extractFeatures(media).collect()
      .find(_.media_id == 1L).get
    assert(again.checksum == f1.checksum)
  }

  test("multimodal: resize updates payload size and metadata") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "image", Array[Byte](1, 2, 3, 4, 5, 6), "image/png",
        Some(3), Some(2), None)).toDS()
    val out = Multimodal.resize(media, 4, 4).collect().head
    assert(out.payload.length == 16 && out.width.contains(4) && out.height.contains(4))
  }

  test("multimodal: frame sampling explodes one video into n frame rows") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(7L, "video", Array.tabulate(100)(_.toByte), "video/mp4",
        None, None, Some(10000L))).toDS()
    val frames = Multimodal.sampleFrames(media, 5).collect().sortBy(_.frame_no)
    assert(frames.length == 5)
    assert(frames.map(_.media_id).forall(_ == 7L))
    assert(frames.last.t_ms == 10000L && frames.head.t_ms == 0L)
    assert(frames.forall(_.frame.nonEmpty))
  }
}
