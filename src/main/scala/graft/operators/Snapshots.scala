package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Crawl-to-crawl snapshot diff.
  *
  * The reference crawls the same filesystem repeatedly into per-run
  * tagged tables (storcrawl.py: each run bootstraps `crawl_<tag>`);
  * the first question users ask of two runs is "what changed" — files
  * added, removed, or modified between snapshots. This operator is
  * that diff, expressed as the canonical co-partitioned FULL OUTER
  * join on the inventory key.
  *
  * Scale shape: both snapshots shuffle once on the join key (path /
  * partkey) and stream through a sort-merge join — no broadcast
  * needed or wanted at 100 TB where both sides are corpus-sized.
  * When snapshots are written bucketed by the key (the layout
  * [[Bucketing]] proves), the diff runs with ZERO exchanges: the
  * repeated-crawl pipeline pays its shuffle once at write time and
  * every subsequent diff is exchange-free. Output is
  * changed-rows-only, which at real change rates (~1%/day) is
  * 100× smaller than either snapshot.
  */
object Snapshots {

  type Q = (SparkSession, String) => DataFrame

  /** q_snapshot_diff — diff two deterministic sub-snapshots of the
    * `part` inventory: snapshot A omits keys ≡0 (mod 11) ("created
    * after A"), snapshot B omits keys ≡0 (mod 13) ("deleted before B")
    * and bumps p_size for keys ≡0 (mod 7) ("modified"). The diff
    * reports every non-identical key with its status and both sizes. */
  val qSnapshotDiff: Q = (s, d) => {
    val part = Tables.part(s, d)
    val snapA = part
      .filter(pmod(col("p_partkey"), lit(11)) =!= 0)
      .select(col("p_partkey"), col("p_size").cast(LongType).as("old_size"))
    val snapB = part
      .filter(pmod(col("p_partkey"), lit(13)) =!= 0)
      .select(col("p_partkey"),
        when(pmod(col("p_partkey"), lit(7)) === 0, col("p_size") + 1)
          .otherwise(col("p_size")).cast(LongType).as("new_size"))
    snapA.join(snapB, Seq("p_partkey"), "full_outer")
      .withColumn("status",
        when(col("old_size").isNull, lit("added"))
          .when(col("new_size").isNull, lit("removed"))
          .when(col("old_size") =!= col("new_size"), lit("changed"))
          .otherwise(lit("same")))
      .filter(col("status") =!= "same")
      .select(col("p_partkey"), col("status"), col("old_size"), col("new_size"))
      .orderBy("p_partkey")
  }

  /** q_merkle_diff — block-level integrity comparison of the same two
    * snapshots [[qSnapshotDiff]] diffs row-by-row: the key space hashes
    * into 64 blocks, each block folds to an order-independent XOR of
    * its row digests, and blocks whose checksums disagree are flagged.
    * This is the Merkle-tree philosophy flattened one level — the
    * coarse pass that tells a 100 TB pipeline WHICH 1/64th of the key
    * space needs the expensive row diff at all (at ~1%/day change
    * rates most blocks hash clean and skip row-level work entirely).
    * XOR, not SUM, folds the digests: order-independent like addition
    * but closed over Long — no overflow for ANSI mode to reject, no
    * wraparound semantics to match across engines.
    *
    * `dirty` (the flag) is oracle-pinned per block against the ground
    * truth both engines derive independently; blocks change iff they
    * contain an added/removed/modified key, so the flag count ties out
    * to [[qSnapshotDiff]]'s row count bucketed the same way.
    *
    * Scale shape: each side is ONE scan + a 64-group aggregate with
    * map-side partial XOR — the shuffle carries 64 longs per
    * partition; the block join is a 64-row broadcast. */
  val qMerkleDiff: Q = (s, d) => {
    import graft.functions.Exprs.md5Long
    def digestBlocks(snap: DataFrame, sizeCol: String): DataFrame =
      snap.select(
        pmod(md5Long(concat(lit("mkb|"), col("p_partkey").cast("string"))),
          lit(64L)).as("block"),
        md5Long(concat(col("p_partkey").cast("string"), lit("|"),
          col(sizeCol).cast("string"))).as("rh"))
        .groupBy("block")
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(rh)").as("xh"))
    val part = Tables.part(s, d)
    val snapA = part
      .filter(pmod(col("p_partkey"), lit(11)) =!= 0)
      .select(col("p_partkey"), col("p_size").cast(LongType).as("sz"))
    val snapB = part
      .filter(pmod(col("p_partkey"), lit(13)) =!= 0)
      .select(col("p_partkey"),
        when(pmod(col("p_partkey"), lit(7)) === 0, col("p_size") + 1)
          .otherwise(col("p_size")).cast(LongType).as("sz"))
    val a = digestBlocks(snapA, "sz")
      .withColumnRenamed("n_rows", "n_rows_a").withColumnRenamed("xh", "xa")
    val b = digestBlocks(snapB, "sz")
      .withColumnRenamed("n_rows", "n_rows_b").withColumnRenamed("xh", "xb")
    a.join(b, Seq("block"), "full_outer")
      .select(col("block"),
        coalesce(col("n_rows_a"), lit(0L)).as("n_rows_a"),
        coalesce(col("n_rows_b"), lit(0L)).as("n_rows_b"),
        when(coalesce(col("xa"), lit(0L)) =!= coalesce(col("xb"), lit(0L)) ||
          coalesce(col("n_rows_a"), lit(0L)) =!= coalesce(col("n_rows_b"), lit(0L)),
          1L).otherwise(0L).cast(LongType).as("dirty"))
      .orderBy("block")
  }

  /** q_incremental_dedup — the ingest-time twin of exact dedup: a new
    * batch (a deterministic ~20% hash slice standing in for "today's
    * crawl") checks its content fingerprints against the existing
    * corpus and within itself, so re-crawled pages never re-enter the
    * training set. Status per incoming doc: `dup_of_corpus` (fingerprint
    * already stored — corpus precedence, with the smallest holder id
    * reported), `dup_in_batch` (an earlier incoming doc has it), else
    * `new`. Scale shape: this is the snapshot-diff philosophy applied
    * to content — both sides are corpus-sized, so the check is ONE
    * co-partitioned shuffle join on the fingerprint (no broadcast
    * wanted), the in-batch rule is a window on the high-cardinality
    * fingerprint key (parallel, skew-free), and with the corpus stored
    * fingerprint-bucketed the daily increment joins exchange-free on
    * the corpus side. */
  val qIncrementalDedup: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val f = Tables.spread(Tables.documents(s, d))
      .filter(col("text").isNotNull)
      .select(col("doc_id"), md5(col("text")).as("fp"),
        (pmod(graft.functions.Exprs.md5Long(
          concat(lit("incr|"), col("doc_id").cast("string"))), lit(5)) === 0).as("inc"))
    val existing = f.filter(!col("inc"))
      .groupBy("fp").agg(min("doc_id").as("first_match"))
    f.filter(col("inc"))
      .select(col("doc_id"), col("fp"))
      .withColumn("batch_first", min("doc_id").over(Window.partitionBy("fp")))
      .join(existing, Seq("fp"), "left")
      .select(col("doc_id"),
        when(col("first_match").isNotNull, "dup_of_corpus")
          .when(col("batch_first") < col("doc_id"), "dup_in_batch")
          .otherwise("new").as("status"),
        col("first_match"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_snapshot_diff" -> qSnapshotDiff,
    "q_merkle_diff" -> qMerkleDiff,
    "q_incremental_dedup" -> qIncrementalDedup)

  val oracle: Map[String, String] = Map(
    "q_merkle_diff" ->
      """WITH a AS (
        |  SELECT p_partkey, CAST(p_size AS BIGINT) AS sz
        |  FROM part WHERE p_partkey % 11 <> 0),
        |b AS (
        |  SELECT p_partkey,
        |    CAST(CASE WHEN p_partkey % 7 = 0 THEN p_size + 1 ELSE p_size END
        |      AS BIGINT) AS sz
        |  FROM part WHERE p_partkey % 13 <> 0),
        |da AS (
        |  SELECT CAST('0x' || substr(md5('mkb|' || CAST(p_partkey AS VARCHAR)), 1, 15)
        |           AS BIGINT) % 64 AS block,
        |    COUNT(*) AS n_rows_a,
        |    bit_xor(CAST('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || '|' ||
        |      CAST(sz AS VARCHAR)), 1, 15) AS BIGINT)) AS xa
        |  FROM a GROUP BY 1),
        |db AS (
        |  SELECT CAST('0x' || substr(md5('mkb|' || CAST(p_partkey AS VARCHAR)), 1, 15)
        |           AS BIGINT) % 64 AS block,
        |    COUNT(*) AS n_rows_b,
        |    bit_xor(CAST('0x' || substr(md5(CAST(p_partkey AS VARCHAR) || '|' ||
        |      CAST(sz AS VARCHAR)), 1, 15) AS BIGINT)) AS xb
        |  FROM b GROUP BY 1)
        |SELECT COALESCE(da.block, db.block) AS block,
        |  CAST(COALESCE(n_rows_a, 0) AS BIGINT) AS n_rows_a,
        |  CAST(COALESCE(n_rows_b, 0) AS BIGINT) AS n_rows_b,
        |  CAST(CASE WHEN COALESCE(xa, 0) <> COALESCE(xb, 0)
        |         OR COALESCE(n_rows_a, 0) <> COALESCE(n_rows_b, 0)
        |       THEN 1 ELSE 0 END AS BIGINT) AS dirty
        |FROM da FULL OUTER JOIN db ON da.block = db.block
        |ORDER BY block""".stripMargin,
    "q_snapshot_diff" ->
      """WITH a AS (
        |  SELECT p_partkey, CAST(p_size AS BIGINT) AS old_size
        |  FROM part WHERE p_partkey % 11 <> 0),
        |b AS (
        |  SELECT p_partkey,
        |    CAST(CASE WHEN p_partkey % 7 = 0 THEN p_size + 1 ELSE p_size END AS BIGINT) AS new_size
        |  FROM part WHERE p_partkey % 13 <> 0),
        |j AS (
        |  SELECT COALESCE(a.p_partkey, b.p_partkey) AS p_partkey, a.old_size, b.new_size,
        |    CASE WHEN a.old_size IS NULL THEN 'added'
        |         WHEN b.new_size IS NULL THEN 'removed'
        |         WHEN a.old_size <> b.new_size THEN 'changed'
        |         ELSE 'same' END AS status
        |  FROM a FULL OUTER JOIN b ON a.p_partkey = b.p_partkey)
        |SELECT p_partkey, status, old_size, new_size
        |FROM j WHERE status <> 'same' ORDER BY p_partkey""".stripMargin,
    "q_incremental_dedup" ->
      """WITH f AS (
        |  SELECT doc_id, md5(text) AS fp,
        |    CAST('0x' || substr(md5('incr|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 5 = 0
        |      AS inc
        |  FROM documents WHERE text IS NOT NULL),
        |ex AS (SELECT fp, MIN(doc_id) AS first_match FROM f WHERE NOT inc GROUP BY fp),
        |bf AS (
        |  SELECT doc_id, fp, MIN(doc_id) OVER (PARTITION BY fp) AS batch_first
        |  FROM f WHERE inc)
        |SELECT bf.doc_id,
        |  CASE WHEN ex.first_match IS NOT NULL THEN 'dup_of_corpus'
        |       WHEN bf.batch_first < bf.doc_id THEN 'dup_in_batch'
        |       ELSE 'new' END AS status,
        |  ex.first_match
        |FROM bf LEFT JOIN ex ON bf.fp = ex.fp
        |ORDER BY bf.doc_id""".stripMargin)
}
