package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Exprs._

/** Deduplication operators for large-scale training-data pipelines, over
  * the `documents` table.
  *
  * All hashing uses the md5-based 60-bit family from [[graft.functions.Exprs]]
  * so every signature is bit-reproducible in the DuckDB oracle. At 100 TB
  * the shapes hold: exact dedup is one hash-shuffle on the group key;
  * minhash-LSH shuffles signatures (tiny: 8 longs/doc), never raw text,
  * and candidate pairs only materialize within a band bucket; simhash is
  * a single aggregation pass per doc.
  */
object Dedup {

  type Q = (SparkSession, String) => DataFrame

  /** Exact dedup: hash-groupBy on content, keep the smallest doc_id
    * (deterministic first-wins, the A5 rule). */
  val qDedupExact: Q = (s, d) => {
    Tables.documents(s, d)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .select(md5(col("text")).as("text_hash"), col("keep_id"), col("dup_count"))
      .orderBy("keep_id")
  }

  /** MinHash + LSH near-dup candidates: char-5-gram shingles (stride 5),
    * 8 minhash permutations, 4 bands × 2 rows; docs sharing any band key
    * become a candidate pair. Shuffle volume after shingling is 8 longs
    * per doc — the scale path for 100 TB (raw text never shuffles). */
  val qDedupMinhashLsh: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val pos = docs.select(
      col("doc_id"), col("text"),
      explode(sequence(lit(1), greatest(length(col("text")) - 4, lit(1)), lit(5))).as("i"))
    val sh = pos.select(col("doc_id"), expr("substr(text, i, 5)").as("sh"))
    val hs = sh
      .select(col("doc_id"), col("sh"), explode(sequence(lit(0), lit(7))).as("seed"))
      .withColumn("h", md5LongSeeded(col("sh"), col("seed")))
    val sig = hs.groupBy("doc_id", "seed").agg(min("h").as("mh"))
    val band = sig
      .groupBy(col("doc_id"), expr("seed div 2").as("band"))
      .agg(
        min(when(col("seed") % 2 === 0, col("mh"))).as("m0"),
        min(when(col("seed") % 2 === 1, col("mh"))).as("m1"))
    val keys = band.select(
      col("doc_id"),
      concat(col("band").cast("string"), lit(":"),
             col("m0").cast("string"), lit(":"),
             col("m1").cast("string")).as("band_key"))
    keys.as("a")
      .join(keys.as("b"),
        col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("b.doc_id").as("b"))
      .distinct()
      .orderBy("a", "b")
  }

  /** SimHash document signatures: 16-bit bit-majority over word hashes.
    * One groupBy per (doc, bit) then per doc — no pairwise work at all,
    * so it scales linearly; near-dup pairs come from comparing
    * signatures by hamming distance downstream. */
  val qDedupSimhash: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val words = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val wh = words.withColumn("h", md5Long(col("word")))
    val bits = wh
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(15))).as("b"))
      .groupBy("doc_id", "b")
      .agg(sum(expr("CASE WHEN shiftright(h, b) % 2 = 1 THEN 1 ELSE -1 END")).as("s"))
    bits
      .groupBy("doc_id")
      .agg(sum(when(col("s") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L)).as("simhash"))
      .orderBy("doc_id")
  }

  /** N-gram Jaccard near-dup: distinct char-8-grams (stride 4), pairs
    * blocked on (source, n_chars/100) — near-dups share length scale —
    * and the Jaccard ≥ 0.1 test done in exact integer cross-multiplied
    * form (inter*10 ≥ union), so no FP is involved anywhere. */
  val qNgramJaccard: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), expr("n_chars div 100").as("blk"), col("text"))
    val pos = docs.select(
      col("doc_id"), col("source"), col("blk"), col("text"),
      explode(sequence(lit(1), greatest(length(col("text")) - 7, lit(1)), lit(4))).as("i"))
    val g = pos
      .select(col("doc_id"), col("source"), col("blk"), expr("substr(text, i, 8)").as("gram"))
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
      .select(
        col("a"), col("b"), col("inter_n"),
        (col("sa.n") + col("sb.n") - col("inter_n")).as("union_n"))
      .orderBy("a", "b")
  }

  val queries: Map[String, Q] = Map(
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_minhash_lsh" -> qDedupMinhashLsh,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_ngram_jaccard" -> qNgramJaccard
  )

  val oracle: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, COUNT(*) AS dup_count
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "q_dedup_minhash_lsh" ->
      """WITH pos AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(1, greatest(length(text)-4, 1), 5)) AS i
        |  FROM documents),
        |sh AS (SELECT doc_id, substr(text, i, 5) AS sh FROM pos),
        |hs AS (SELECT doc_id,
        |         CAST('0x' || substr(md5(sh || '|' || CAST(seed AS VARCHAR)), 1, 15) AS BIGINT) AS h,
        |         seed
        |       FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) seeds),
        |sig AS (SELECT doc_id, seed, min(h) AS mh FROM hs GROUP BY doc_id, seed),
        |band AS (SELECT doc_id, seed // 2 AS band,
        |           min(CASE WHEN seed % 2 = 0 THEN mh END) AS m0,
        |           min(CASE WHEN seed % 2 = 1 THEN mh END) AS m1
        |         FROM sig GROUP BY doc_id, seed // 2),
        |keys AS (SELECT doc_id,
        |           CAST(band AS VARCHAR) || ':' || CAST(m0 AS VARCHAR) || ':' || CAST(m1 AS VARCHAR) AS band_key
        |         FROM band)
        |SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
        |FROM keys a JOIN keys b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
        |ORDER BY a, b""".stripMargin,
    "q_dedup_simhash" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        |wh AS (SELECT doc_id, CAST('0x' || substr(md5(word), 1, 15) AS BIGINT) AS h
        |       FROM w WHERE length(word) > 0),
        |bits AS (SELECT doc_id, b,
        |           SUM(CASE WHEN (h >> b) % 2 = 1 THEN 1 ELSE -1 END) AS s
        |         FROM wh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b) bs
        |         GROUP BY doc_id, b)
        |SELECT doc_id,
        |  SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_ngram_jaccard" ->
      """WITH pos AS (
        |  SELECT doc_id, source, n_chars // 100 AS blk, text,
        |         unnest(generate_series(1, greatest(length(text)-7, 1), 4)) AS i
        |  FROM documents),
        |g AS (SELECT DISTINCT doc_id, source, blk, substr(text, i, 8) AS gram FROM pos),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter_n
        |  FROM g a JOIN g b ON a.source = b.source AND a.blk = b.blk
        |                   AND a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT i.a, i.b, i.inter_n, sa.n + sb.n - i.inter_n AS union_n
        |FROM inter i
        |JOIN sz sa ON i.a = sa.doc_id
        |JOIN sz sb ON i.b = sb.doc_id
        |WHERE i.inter_n * 10 >= sa.n + sb.n - i.inter_n
        |ORDER BY a, b""".stripMargin
  )
}
