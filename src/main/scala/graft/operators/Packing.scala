package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.functions.Exprs

/** Sequence packing — the stage of an LLM training pipeline that turns a
  * deduplicated, filtered corpus into fixed-length training sequences.
  * Two industry-standard strategies, both deterministic and both
  * shard-parallel (beyond the reference, which stops at file metadata):
  *
  *  1. '''Concat-and-chunk''' ([[qPackChunks]]): documents are laid out
  *     end-to-end in a fixed order and the stream is cut every
  *     `contextLen` tokens (GPT-style packing; documents may straddle a
  *     cut). Pure window arithmetic over a running token sum — a
  *     document's placement is `[start_off, start_off + tokens)` in its
  *     shard's stream, and every chunk index falls out of integer
  *     division. No stateful scan needed.
  *
  *  2. '''Greedy no-split bin packing''' ([[greedyPack]] /
  *     [[qGreedyPack]]): documents never straddle bins; a bin closes
  *     when the next document would overflow `capacity`. This IS a
  *     stateful scan (each decision depends on the accumulated fill),
  *     so it runs as a typed `groupByKey(shard).flatMapGroups` — the
  *     Spark shape for per-key sequential logic — while the DuckDB twin
  *     derives the identical assignment with a recursive CTE.
  *
  * Scale shape: packing is embarrassingly parallel ACROSS shards and
  * inherently sequential WITHIN a shard, so the shard is the unit of
  * distribution. Shard assignment is a content hash (order- and
  * cluster-size-independent, like q_hash_split); shard count scales
  * with the corpus so one shard's documents fit one task — at 100 TB
  * with ~1M-token shards that is millions of independent tasks and the
  * only shuffle is the one hash partition. Real pipelines pack within
  * output files exactly this way; a global sequential pack would be
  * both unscalable and no better for training.
  */
object Packing {

  type Q = (SparkSession, String) => DataFrame

  /** Input to the greedy packer: one document in one shard. */
  case class PackDoc(shard: Long, doc_id: Long, tokens: Long)

  /** Greedy placement: `bin` is per-shard, `bin_off` is the token
    * offset of the document inside its bin. */
  case class PackedDoc(doc_id: Long, shard: Long, bin: Long, bin_off: Long, tokens: Long)

  /** Whitespace token count, exact on both engines:
    * `length(text) - length(replace(text,' ','')) + 1`. */
  def wsTokens(text: Column): Column =
    (length(text) - length(replace(text, lit(" "), lit(""))) + 1).cast(LongType)

  /** Content-hash shard in `[0, nShards)` — deterministic under
    * re-runs, re-partitioning, and cluster resizes. */
  def shardOf(docId: Column, nShards: Int): Column =
    pmod(Exprs.md5Long(concat(lit("pack|"), docId.cast("string"))), lit(nShards))
      .cast(LongType)

  /** Concat-and-chunk layout: per (shard, doc_id) order, the running
    * token sum places each document at `start_off`; chunk indices are
    * `start_off div contextLen` … `(start_off + tokens - 1) div
    * contextLen`. One window per shard — never an unpartitioned window
    * (the q_global_rank lesson: shards are many, so no task funnel). */
  def packChunks(docs: DataFrame, nShards: Int, contextLen: Long): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), shardOf(col("doc_id"), nShards).as("shard"),
        wsTokens(col("text")).as("tokens"))
      .withColumn("start_off", sum(col("tokens")).over(w) - col("tokens"))
      .withColumn("first_chunk", expr(s"start_off div $contextLen"))
      .withColumn("last_chunk", expr(s"(start_off + tokens - 1) div $contextLen"))
      .withColumn("n_chunks", col("last_chunk") - col("first_chunk") + 1)
  }

  /** Greedy no-split packing of each shard's documents (ascending
    * doc_id): close the bin when the next document would push fill past
    * `capacity`; an oversized document gets a bin of its own. The group
    * is sorted and folded in memory — by construction a shard is sized
    * to fit one task. */
  def greedyPack(docs: Dataset[PackDoc], capacity: Long): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.shard).flatMapGroups { (shard, it) =>
      val sorted = it.toArray.sortBy(_.doc_id)
      val out = Array.newBuilder[PackedDoc]
      var bin = 0L
      var fill = 0L
      var first = true
      sorted.foreach { d =>
        if (first) { first = false; fill = d.tokens }
        else if (fill + d.tokens > capacity) { bin += 1; fill = d.tokens }
        else { fill += d.tokens }
        out += PackedDoc(d.doc_id, shard, bin, fill - d.tokens, d.tokens)
      }
      out.result().iterator
    }
  }

  private val NShards = 8
  private val ContextLen = 512L

  // NULL-text documents carry no tokens to pack; without the filter a
  // NULL tokens value would crash the non-nullable PackDoc encoder at
  // runtime while DuckDB silently emitted NULL-token rows — filter on
  // both engines instead (same predicate the sibling text queries use)
  val qPackChunks: Q = (s, d) =>
    packChunks(Tables.documents(s, d).filter(col("text").isNotNull),
      NShards, ContextLen).orderBy("doc_id")

  val qGreedyPack: Q = (s, d) => {
    import s.implicits._
    val in = Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(shardOf(col("doc_id"), NShards).as("shard"), col("doc_id"),
        wsTokens(col("text")).as("tokens"))
      .as[PackDoc]
    greedyPack(in, ContextLen).toDF()
      .select(col("doc_id"), col("shard"), col("bin"), col("bin_off"), col("tokens"))
      .orderBy("doc_id")
  }

  private val ShardBytes = 16384L

  /** q_shard_plan — the output-writer layout plan: per source, docs
    * stream in doc_id order into byte-budgeted shards (a doc opens a
    * new shard when the running byte offset crosses the 16 KiB fixture
    * budget — shard id = start-offset div budget, so a doc can
    * straddle but always BELONGS to where it started, the contract
    * parquet writers use for row-group assignment). Emits per (source,
    * shard): docs, bytes, the doc_id span, and the fill permille. This
    * is the plan a 100 TB writer computes BEFORE writing, so output
    * files land at target size instead of the 1-file-per-task lottery;
    * the fixture budget is deliberately tiny for fan-out.
    *
    * Plan: one per-source prefix-sum window (the exchange the per-
    * shard aggregate reuses — Catalyst collapses both onto one hash
    * partitioning by source), then a (source, shard) hash aggregate.
    * Same shape as [[qPackChunks]] but byte- not token-budgeted and
    * source- not hash-sharded: layout, not training mix. */
  val qShardPlan: Q = (s, d) => {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("start_off",
        (sum(col("n_chars")).over(w) - col("n_chars")).cast(LongType))
      .withColumn("shard", expr(s"start_off div $ShardBytes").cast(LongType))
      .groupBy("source", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast(LongType).as("bytes"),
        min(col("doc_id")).cast(LongType).as("first_doc"),
        max(col("doc_id")).cast(LongType).as("last_doc"))
      .withColumn("fill_permille",
        expr(s"(bytes * 1000) div $ShardBytes").cast(LongType))
      .orderBy("source", "shard")
  }

  /** q_packing_efficiency — why sequence packing exists, as a table:
    * for context lengths L ∈ {256, 512, 1024}, the padding a
    * one-doc-per-sequence loader wastes (Σ⌈tok/L⌉·L − Σtok) versus
    * the residual waste of dense concatenation (⌈Σtok/L⌉·L − Σtok,
    * at most one sequence's worth), both in permille of sequences
    * emitted. The doc-boundary waste GROWS with L (every doc rounds
    * up further); the packed waste shrinks toward zero — the curve
    * that justifies [[qPackChunks]]'s design at any corpus size.
    * Plan: token counts once (scan-side length algebra), a 3-row L
    * spine exploded onto the aggregate — corpus work is ONE pass, the
    * sweep itself runs on 3 rows. */
  val qPackingEfficiency: Q = (s, d) => {
    val toks = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(wsTokens(col("text")).as("tok"))
      .select(explode(array(lit(256L), lit(512L), lit(1024L))).as("ctx_len"),
        col("tok"))
    toks.groupBy("ctx_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).cast(LongType).as("total_tokens"),
        sum(expr("((tok + ctx_len - 1) div ctx_len) * ctx_len")).cast(LongType)
          .as("padded_tokens"))
      .withColumn("packed_tokens",
        expr("((total_tokens + ctx_len - 1) div ctx_len) * ctx_len")
          .cast(LongType))
      .select(col("ctx_len"), col("n_docs"), col("total_tokens"),
        expr("((padded_tokens - total_tokens) * 1000) div padded_tokens")
          .cast(LongType).as("pad_waste_permille"),
        expr("((packed_tokens - total_tokens) * 1000) div packed_tokens")
          .cast(LongType).as("packed_waste_permille"))
      .orderBy("ctx_len")
  }

  /** q_curriculum_plan — curriculum PHASE boundaries (Bengio et al.
    * 2009, easy→hard ordering) computed as a plan, not a sort: within
    * each source, documents bucket by log₂ whitespace-token length
    * (short = easy), and each bucket is assigned to the training
    * phase (quartile 0-3 by cumulative doc count) in which it STARTS —
    * whole buckets, never split, because a curriculum scheduler
    * consumes "phase 0 = these buckets of that source" and interleaves
    * sources by phase. Per (source, bucket): docs, tokens, cumulative
    * docs, phase.
    *
    * The planner's point at 100 TB: a per-document global easy→hard
    * sort is a corpus-wide total order (the known window anti-
    * pattern); phase boundaries need only the per-source difficulty
    * HISTOGRAM — one aggregate plus a cumsum over ≤ ~40 bucket rows
    * per source. Documents then route to phases by a map-side bucket
    * lookup; nothing is ever globally sorted. */
  val qCurriculumPlan: Q = (s, d) => {
    val hist = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("source"), wsTokens(col("text")).as("tok"))
      .withColumn("bucket", length(bin(col("tok"))).cast(LongType))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("tok").cast(LongType).as("tokens"))
    val wCum = Window.partitionBy("source").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSrc = Window.partitionBy("source")
    hist
      .withColumn("cum_docs", sum("n_docs").over(wCum).cast(LongType))
      .withColumn("n_src", sum("n_docs").over(wSrc).cast(LongType))
      .withColumn("phase",
        expr("((cum_docs - n_docs) * 4) div n_src").cast(LongType))
      .select(col("source"), col("bucket"),
        col("n_docs").cast(LongType).as("n_docs"),
        col("tokens"), col("cum_docs"), col("phase"))
      .orderBy("source", "bucket")
  }

  /** q_pack_mix — the cross-document contamination audit of the
    * [[qPackChunks]] layout: a packed context window usually carries
    * MULTIPLE documents (and, when shard hashing mixes sources,
    * multiple SOURCES) — exactly the attention-bleed the
    * document-masking literature worries about. Per (n_docs,
    * n_sources) cell: how many context windows look like that. The
    * histogram is what you check before deciding whether packing
    * needs boundary masks or source-homogeneous shards.
    *
    * Plan: the [[packChunks]] prefix-sum window (per-shard, many
    * shards — no funnel), an explode of each doc onto its chunk RANGE
    * (≤ tokens/L + 1 chunks per doc — output linear in corpus
    * tokens/L), a (shard, chunk) count-distinct aggregate that Spark
    * expands to the two-phase partial-distinct form, and a final
    * ≤ |cells| rollup. Every stage strictly smaller than the last. */
  val qPackMix: Q = (s, d) => {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val placed = Tables.documents(s, d).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        shardOf(col("doc_id"), NShards).as("shard"),
        wsTokens(col("text")).as("tokens"))
      .withColumn("start_off", sum(col("tokens")).over(w) - col("tokens"))
    val membership = placed.select(col("shard"), col("source"),
      explode(sequence(expr(s"start_off div $ContextLen"),
        expr(s"(start_off + tokens - 1) div $ContextLen"))).as("chunk"))
    membership.groupBy("shard", "chunk")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"))
      .groupBy("n_docs", "n_sources")
      .agg(count(lit(1)).as("n_chunks"))
      .orderBy("n_docs", "n_sources")
  }

  /** q_pad_waste — length-bucketed batching waste curve: for each
    * candidate bucket width w ∈ {64, 128, 256, 512}, the padding a
    * pad-to-bucket batcher wastes when every document pads to the next
    * multiple of w (⌈t/w⌉·w), as absolute tokens and as permille of
    * padded volume. The complement of [[qPackChunks]]' concat-packing:
    * when sequences must NOT cross document boundaries, bucketing is
    * the standard layout, and this curve is how its width gets chosen
    * (the knee is the budget decision). One scan, a 4× map-side
    * explode, a 4-group rollup — nothing scale-relevant beyond the
    * scan. */
  val qPadWaste: Q = (s, d) => {
    Tables.documents(s, d)
      .filter(col("text").isNotNull)
      .select(wsTokens(col("text")).as("t"))
      .select(col("t"), explode(array(lit(64L), lit(128L), lit(256L),
        lit(512L))).as("bucket_w"))
      .withColumn("padded", expr("((t + bucket_w - 1) div bucket_w) * bucket_w"))
      .groupBy("bucket_w")
      .agg(count(lit(1)).as("n_docs"),
        sum("t").cast(LongType).as("total_tokens"),
        sum("padded").cast(LongType).as("total_padded"))
      .withColumn("waste_permille",
        expr("((total_padded - total_tokens) * 1000) div total_padded")
          .cast(LongType))
      .orderBy("bucket_w")
  }

  val queries: Map[String, Q] = Map(
    "q_pad_waste" -> qPadWaste,
    "q_pack_chunks" -> qPackChunks,
    "q_greedy_pack" -> qGreedyPack,
    "q_shard_plan" -> qShardPlan,
    "q_curriculum_plan" -> qCurriculumPlan,
    "q_pack_mix" -> qPackMix,
    "q_packing_efficiency" -> qPackingEfficiency)

  private def shardDuck(expr: String): String =
    s"CAST('0x' || substr(md5('pack|' || CAST($expr AS VARCHAR)), 1, 15) AS BIGINT) % $NShards"

  val oracle: Map[String, String] = Map(
    "q_pad_waste" ->
      """SELECT CAST(w AS BIGINT) AS bucket_w,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(t) AS BIGINT) AS total_tokens,
        |  CAST(SUM(((t + w - 1) // w) * w) AS BIGINT) AS total_padded,
        |  CAST((SUM(((t + w - 1) // w) * w - t) * 1000)
        |    // SUM(((t + w - 1) // w) * w) AS BIGINT) AS waste_permille
        |FROM (SELECT CAST(length(text) - length(replace(text, ' ', '')) + 1
        |        AS BIGINT) AS t
        |      FROM documents WHERE text IS NOT NULL),
        |  LATERAL (SELECT unnest(ARRAY[64, 128, 256, 512]) AS w)
        |GROUP BY w ORDER BY w""".stripMargin,
    "q_pack_mix" ->
      s"""WITH base AS (
        |  SELECT doc_id, source,
        |    ${shardDuck("doc_id")} AS shard,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
        |      AS tokens
        |  FROM documents WHERE text IS NOT NULL),
        |placed AS (
        |  SELECT shard, source, tokens,
        |    SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - tokens AS start_off
        |  FROM base),
        |mem AS (
        |  SELECT shard, source,
        |    unnest(generate_series(CAST(start_off // $ContextLen AS BIGINT),
        |      CAST((start_off + tokens - 1) // $ContextLen AS BIGINT))) AS chunk
        |  FROM placed),
        |pc AS (
        |  SELECT shard, chunk, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        |  FROM mem GROUP BY 1, 2)
        |SELECT n_docs, n_sources, CAST(COUNT(*) AS BIGINT) AS n_chunks
        |FROM pc GROUP BY 1, 2 ORDER BY n_docs, n_sources""".stripMargin,
    "q_curriculum_plan" ->
      """WITH hist AS (
        |  SELECT source,
        |    CAST(length(bin(CAST(length(text) - length(replace(text, ' ', ''))
        |      + 1 AS BIGINT))) AS BIGINT) AS bucket,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT)) AS BIGINT) AS tokens
        |  FROM documents WHERE text IS NOT NULL GROUP BY 1, 2),
        |cum AS (
        |  SELECT source, bucket, n_docs, tokens,
        |    CAST(SUM(n_docs) OVER (PARTITION BY source ORDER BY bucket
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs,
        |    CAST(SUM(n_docs) OVER (PARTITION BY source) AS BIGINT) AS n_src
        |  FROM hist)
        |SELECT source, bucket, n_docs, tokens, cum_docs,
        |  CAST(((cum_docs - n_docs) * 4) // n_src AS BIGINT) AS phase
        |FROM cum ORDER BY source, bucket""".stripMargin,
    "q_packing_efficiency" ->
      """WITH toks AS (
        |  SELECT CAST(length(text) - length(replace(text, ' ', '')) + 1
        |    AS BIGINT) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |sw AS (
        |  SELECT CAST(unnest([256, 512, 1024]) AS BIGINT) AS ctx_len),
        |agg AS (
        |  SELECT ctx_len, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(tok) AS BIGINT) AS total_tokens,
        |    CAST(SUM(((tok + ctx_len - 1) // ctx_len) * ctx_len) AS BIGINT)
        |      AS padded_tokens
        |  FROM sw CROSS JOIN toks GROUP BY ctx_len),
        |p AS (
        |  SELECT ctx_len, n_docs, total_tokens, padded_tokens,
        |    ((total_tokens + ctx_len - 1) // ctx_len) * ctx_len AS packed_tokens
        |  FROM agg)
        |SELECT ctx_len, n_docs, total_tokens,
        |  CAST(((padded_tokens - total_tokens) * 1000) // padded_tokens
        |    AS BIGINT) AS pad_waste_permille,
        |  CAST(((packed_tokens - total_tokens) * 1000) // packed_tokens
        |    AS BIGINT) AS packed_waste_permille
        |FROM p ORDER BY ctx_len""".stripMargin,
    "q_shard_plan" ->
      s"""WITH offs AS (
        |  SELECT source, doc_id, n_chars,
        |    CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_chars AS BIGINT) AS start_off
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT source, CAST(start_off // $ShardBytes AS BIGINT) AS shard,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS bytes,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
        |  CAST(MAX(doc_id) AS BIGINT) AS last_doc,
        |  CAST((SUM(n_chars) * 1000) // $ShardBytes AS BIGINT) AS fill_permille
        |FROM offs GROUP BY 1, 2 ORDER BY source, shard""".stripMargin,
    "q_pack_chunks" ->
      s"""SELECT doc_id, shard, tokens, start_off,
        |  start_off // $ContextLen AS first_chunk,
        |  (start_off + tokens - 1) // $ContextLen AS last_chunk,
        |  (start_off + tokens - 1) // $ContextLen - start_off // $ContextLen + 1 AS n_chunks
        |FROM (
        |  SELECT doc_id, shard, tokens,
    |    CAST(SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tokens AS BIGINT) AS start_off
        |  FROM (
        |    SELECT doc_id, ${shardDuck("doc_id")} AS shard,
        |      length(text) - length(replace(text, ' ', '')) + 1 AS tokens
        |    FROM documents WHERE text IS NOT NULL))
        |ORDER BY doc_id""".stripMargin,
    "q_greedy_pack" ->
      s"""WITH RECURSIVE ord AS (
        |  SELECT doc_id, shard, tokens,
        |    row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
        |  FROM (
        |    SELECT doc_id, ${shardDuck("doc_id")} AS shard,
        |      length(text) - length(replace(text, ' ', '')) + 1 AS tokens
        |    FROM documents WHERE text IS NOT NULL)),
        |packed AS (
        |  SELECT doc_id, shard, tokens, rn,
        |    CAST(0 AS BIGINT) AS bin, tokens AS fill
        |  FROM ord WHERE rn = 1
        |  UNION ALL
        |  SELECT o.doc_id, o.shard, o.tokens, o.rn,
        |    CASE WHEN p.fill + o.tokens > $ContextLen THEN p.bin + 1 ELSE p.bin END,
        |    CASE WHEN p.fill + o.tokens > $ContextLen THEN o.tokens
        |         ELSE p.fill + o.tokens END
        |  FROM packed p JOIN ord o ON o.shard = p.shard AND o.rn = p.rn + 1)
        |SELECT doc_id, shard, bin, fill - tokens AS bin_off, tokens
        |FROM packed ORDER BY doc_id""".stripMargin)
}
