package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parameterized sign-random-projection (SRP) LSH for embedding
  * near-duplicate detection at corpus scale.
  *
  * The oracle query `q_embedding_neardup` ([[Similarity.qEmbeddingNeardup]])
  * uses a FIXED 8-coordinate-sign bucket key — fine as a deterministic
  * teaching/oracle variant, but its within-bucket pair count is n²/256:
  * quadratic in the corpus. This is the production-scale replacement:
  *
  *   - '''bits per band''' scales with the corpus: b = log₂(n / targetBucket)
  *     keeps expected bucket occupancy constant as n grows, so
  *     within-bucket pairing stays ~n·targetBucket/2 — LINEAR in n.
  *   - '''seeded Gaussian hyperplanes''', not coordinate signs: coordinate
  *     values correlate on real embeddings (anisotropic dimensions), which
  *     makes coordinate-sign buckets hot; random rotations spread them.
  *   - '''banding''' gives closed-form recall: a pair at cosine s collides
  *     in one b-bit band with p(s)^b where p(s) = 1 − acos(s)/π, so
  *     L = ⌈ln(1−recall)/ln(1−p^b)⌉ bands guarantee the target recall.
  *   - '''multiprobe''' flips the lowest-|margin| signature bits on the
  *     probe side, trading a small candidate increase for fewer bands
  *     (lower shuffle volume) at the same recall.
  *   - '''skew-salted pairing''': within-bucket pair generation goes
  *     through [[Skew.saltedSelfPairs]], so even an adversarially hot
  *     bucket (boilerplate-heavy corpora produce them) spreads its
  *     quadratic work over salt cells instead of one reducer.
  *
  * Float math throughout (like [[Similarity.cosineTopkFloat]]) — this is
  * the non-oracle scale path; recall is asserted against the brute-force
  * ground truth in ScaleSpec rather than a SQL oracle.
  */
object SignLsh {

  /** LSH configuration. `bits` sets bucket granularity (2^bits buckets
    * per band), `bands` sets recall, `multiprobe` (T) additionally
    * probes the T nearest single-bit-flip buckets per band. */
  final case class Params(bits: Int, bands: Int, seed: Long, multiprobe: Int = 0) {
    require(bits >= 1 && bits <= 62, s"bits must be in [1,62], got $bits")
    require(bands >= 1, s"bands must be >= 1, got $bands")
    require(multiprobe >= 0 && multiprobe <= bits, s"multiprobe must be in [0,bits]")
  }

  /** Collision probability of one hyperplane for a pair at cosine `s`. */
  def collisionP(s: Double): Double = 1.0 - math.acos(math.max(-1.0, math.min(1.0, s))) / math.Pi

  /** Bits per band that keep expected bucket occupancy ≈ targetBucket:
    * b = ⌈log₂(n / targetBucket)⌉. This is the knob that makes the plan
    * survive scale — bucket count grows WITH the corpus. */
  def bitsFor(corpusSize: Long, targetBucket: Int = 1024): Int = {
    require(corpusSize > 0 && targetBucket > 0)
    val b = math.ceil(math.log(corpusSize.toDouble / targetBucket) / math.log(2.0)).toInt
    math.max(1, math.min(62, b))
  }

  /** Bands needed for `recall` on pairs at cosine ≥ simThreshold:
    * L = ⌈ln(1−recall) / ln(1−p^b)⌉. */
  def bandsFor(bits: Int, simThreshold: Double, recall: Double): Int = {
    require(recall > 0 && recall < 1, "recall must be in (0,1)")
    val pb = math.pow(collisionP(simThreshold), bits.toDouble)
    if (pb >= 1.0) 1
    else math.max(1, math.ceil(math.log1p(-recall) / math.log1p(-pb)).toInt)
  }

  /** Sized-from-first-principles parameters: bucket width from corpus
    * size, band count from the recall target at the similarity
    * threshold. */
  def paramsFor(
      corpusSize: Long,
      simThreshold: Double,
      recall: Double = 0.9,
      targetBucket: Int = 1024,
      seed: Long = 42L,
      multiprobe: Int = 0): Params = {
    val b = bitsFor(corpusSize, targetBucket)
    Params(b, bandsFor(b, simThreshold, recall), seed, math.min(multiprobe, b))
  }

  /** Deterministic seeded Gaussian hyperplanes, [band][bit][dim]. Tiny
    * (bands×bits×dim floats) — generated on the driver and inlined as
    * literals into the plan; nothing is broadcast or shuffled. */
  def hyperplanes(p: Params, dim: Int): Array[Array[Array[Float]]] = {
    val rnd = new scala.util.Random(p.seed)
    Array.fill(p.bands)(Array.fill(p.bits)(Array.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  private def dotLit(emb: Column, plane: Array[Float]): Column =
    Similarity.dotFloat(emb, typedlit(plane.toSeq))

  /** Per-vector band signatures: one row per (vec_id, band) with the
    * b-bit bucket `key` and, when multiprobe is on, the T single-bit-flip
    * `probes` ordered by ascending |margin| (the flips most likely to
    * recover a near-miss pair).
    *
    * All bands compute inside ONE native expression
    * ([[graft.functions.SignBandsExpr]]): the per-projection column
    * construction this replaces emitted bands×bits dot nodes into a
    * single Project, which at corpus-sized parameters (12 bits × 12
    * bands at 20k vectors — StressSpec) exceeded the JVM's 64 KB
    * generated-method limit and silently dropped the whole stage to
    * interpreted eval. SignBandsSpec pins bit-equality against the
    * column construction AND that the stage still compiles with
    * `spark.sql.codegen.fallback=false` at those parameters. */
  def signatures(corpus: DataFrame, p: Params, dim: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val planes = hyperplanes(p, dim)
    val flat: IndexedSeq[Float] =
      planes.iterator.flatMap(_.iterator.flatMap(_.iterator)).toIndexedSeq
    val sig = ColumnBridge.column(graft.functions.SignBandsExpr(
      ColumnBridge.expression(col("embedding")), flat, p.bands, p.bits, p.multiprobe))
    corpus
      .select(col("vec_id"), col("embedding"), explode(sig).as("s"))
      .select(col("vec_id"), col("s.band").as("band"), col("s.key").as("key"),
        col("s.flipbits").as("flipbits"))
  }

  /** The pre-[[graft.functions.SignBandsExpr]] column construction of
    * one band's struct — retained as the equality reference for
    * SignBandsSpec (bands×bits dot nodes; do not use at scale). */
  private[graft] def bandStructColumn(
      planes: Array[Array[Array[Float]]], l: Int, p: Params): Column = {
    val projs = (0 until p.bits).map(i => dotLit(col("embedding"), planes(l)(i)))
    val key = projs.zipWithIndex.map { case (pr, i) =>
      when(pr >= 0d, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    if (p.multiprobe == 0)
      struct(lit(l).as("band"), key.as("key"), typedlit(Seq.empty[Long]).as("flipbits"))
    else {
      val margins = array(projs.zipWithIndex.map { case (pr, i) =>
        struct(abs(pr).as("m"), lit(1L << i).as("bit"))
      }: _*)
      val flips = transform(
        slice(array_sort(margins), 1, p.multiprobe), s => s.getField("bit"))
      struct(lit(l).as("band"), key.as("key"), flips.as("flipbits"))
    }
  }

  /** Candidate (a < b) pairs, each exactly once. Exact same-bucket pairs
    * go through the triangle-salted self-join (hot buckets spread over
    * `saltBuckets` cells); multiprobe adds asymmetric flipped-bucket
    * probes. One shuffle on (band, key) is the whole story — no
    * all-pairs stage anywhere. */
  def candidatePairs(corpus: DataFrame, p: Params, dim: Int = 64,
      saltBuckets: Int = 8): DataFrame = {
    val sigs = signatures(corpus, p, dim).persist()
    try {
      val exact = Skew.saltedSelfPairs(sigs, Seq("band", "key"), "vec_id", saltBuckets)
      val all =
        if (p.multiprobe == 0) exact
        else {
          val probes = sigs
            .select(col("vec_id").as("pa"), col("band"),
              explode(col("flipbits")).as("fb"), col("key"))
            .select(col("pa"), col("band"),
              (col("key").bitwiseXOR(col("fb"))).as("key"))
          val hits = probes.join(
              sigs.select(col("vec_id").as("pb"), col("band"), col("key")),
              Seq("band", "key"))
            .filter(col("pa") =!= col("pb"))
            .select(least(col("pa"), col("pb")).as("a"),
                    greatest(col("pa"), col("pb")).as("b"))
          exact.union(hits)
        }
      // eager localCheckpoint: materialized before the signature cache
      // drops, and the blocks free on GC instead of leaking in a
      // long-lived session
      all.distinct().localCheckpoint()
    } finally sigs.unpersist()
  }

  // ---- Oracle-verifiable decimal variant --------------------------------
  //
  // The float path above is the production form; this variant proves the
  // SAME algorithm (corpus-scaled banded sign-LSH) deterministically
  // against DuckDB: hyperplane weights are 2-dp DECIMAL literals and
  // coordinates exact DECIMAL(12,8), so every dot product (and therefore
  // every signature bit) is EXACT and engine-identical — no float sign
  // boundaries anywhere.

  /** Seeded Gaussian hyperplanes quantized to exact 2-dp decimals,
    * [band][bit][dim]. */
  def decimalHyperplanes(p: Params, dim: Int): Array[Array[Array[java.math.BigDecimal]]] = {
    val rnd = new scala.util.Random(p.seed)
    Array.fill(p.bands)(Array.fill(p.bits)(Array.fill(dim)(
      java.math.BigDecimal.valueOf(math.round(rnd.nextGaussian() * 100), 2))))
  }

  /** The oracle twin's parameter ceiling: hyperplanes are generated
    * once at [[OracleMaxBits]] per band and each run USES the first
    * `adaptiveBits(n)` of them — so the plane literals (and the DuckDB
    * VALUES table built from them) are corpus-independent while the
    * bucket count still grows with the corpus. 16 bits covers corpora
    * to ~2M vectors at the target-32 occupancy. */
  private[operators] val OracleMaxBits = 16
  private[operators] val OracleBands = 2
  private[operators] val OracleParams =
    Params(bits = OracleMaxBits, bands = OracleBands, seed = 42L)

  /** Scale-adaptive bits for the PROOF-TWIN queries: the smallest
    * b ∈ [4, [[OracleMaxBits]]] with 32·2^b ≥ n — [[bitsFor]] with
    * target bucket 32, in pure INTEGER arithmetic so DuckDB computes
    * the identical value in SQL (a float log2 could differ by an ulp
    * at a boundary and flip the whole parameterization). Round 11's
    * sf1 scale run caught the previous PINNED bits=4: at 10× corpus
    * the buckets held 10× the vectors and candidate pairs grew ~100×
    * (43.9× measured wall) — fixed occupancy, not fixed bits, is what
    * survives scale. */
  private[operators] def adaptiveBits(n: Long): Int =
    (4 to OracleMaxBits).find(b => 32L * (1L << b) >= n).getOrElse(OracleMaxBits)

  /** The same formula as a DuckDB scalar CTE (`bn(v)`). */
  private def bnCte: String =
    s"""bn AS (
       |  SELECT COALESCE(MIN(b), $OracleMaxBits) AS v
       |  FROM (SELECT unnest(generate_series(4, $OracleMaxBits)) AS b)
       |  WHERE 32 * (1 << b) >= (SELECT count(*) FROM embeddings))""".stripMargin

  /** Banded sign-LSH near-dup with exact decimal signatures — the
    * scaled algorithm, hash-verified against the generated-SQL twin in
    * [[oracle]]. Candidate pairs only form inside a (band, key) bucket;
    * verification is the exact-decimal cosine at ≥ 0.3. */
  private def decDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.DecimalDotExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** One hyperplane as ONE array literal node. The previous form —
    * `array(64 × lit(v).cast(decimal))` — put 512 Cast(Literal) nodes
    * into the pre-optimization plan per query (8 planes × 64 dims);
    * constant folding collapsed them to the same single literal this
    * builds directly, but the analyzer/optimizer paid for the big tree
    * on every compile (~0.35 s/query of the seq bench was plan
    * compilation). Identical decimals, identical plan after folding —
    * only compile time changes. */
  private def planeCol(w: Array[java.math.BigDecimal]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(org.apache.spark.sql.catalyst.expressions.Literal.create(
      w.toSeq,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DecimalType(12, 8), containsNull = false)))
  }

  /** The oracle-twin signature table (vec_id, band, key, flip) and the
    * decimal-norm verify table (vec_id, de, nrm), memoized per
    * (session, dir) under [[graft.Memo]] (r16). [[qSignlshNeardup]]
    * and [[qSignlshMultiprobe]] each rebuilt the full
    * adaptive-bits × bands decimal-dot signature pipeline (plus the
    * emb.count() sizing job and two localCheckpoint barriers)
    * privately — at 100 TB, two corpus-scale signature scans for one
    * LSH report. The neardup query reads (band, key) only; the flip
    * column it ignores prices one extra array_sort over ≤bits structs
    * per (vector, band) — noise next to the shared dots. Entries are
    * signature-sized (2 rows/vec of three longs) and norm-sized
    * (1 row/vec of a 64-decimal array). */
  private val oracleKeysMemo = new graft.Memo("signlsh-oracle-keys")
  private val oracleNormsMemo = new graft.Memo("signlsh-oracle-norms")

  private def oracleKeyTable(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    oracleKeysMemo(s, d) {
      val planes = decimalHyperplanes(OracleParams, 64)
      val emb = graft.Tables.embeddings(s, d)
      // one driver-side count sizes the signature width so bucket
      // occupancy stays ~32 at ANY corpus size (integer formula —
      // engine-identical to the oracle's bn CTE); runs once per
      // (session, dir) inside the memo build
      val bits = adaptiveBits(emb.count())
      val de = Similarity.decVec(col("embedding"))
      val bandStructs = (0 until OracleBands).map { b =>
        val dots = (0 until bits).map(i => decDot(de, planeCol(planes(b)(i))))
        val key = dots.zipWithIndex.map { case (dt, i) =>
          when(dt >= 0, lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _)
        // lowest-|margin| bit mask: lexicographic struct sort on
        // (|dot|, mask) — mask is monotone in bit index, so the
        // tiebreak matches the oracle's ORDER BY abs(dot), bit
        val margins = array(dots.zipWithIndex.map { case (dt, i) =>
          struct(abs(dt).as("m"), lit(1L << i).as("bit"))
        }: _*)
        val flip = element_at(array_sort(margins), 1).getField("bit")
        struct(lit(b).as("band"), key.as("key"), flip.as("flip"))
      }
      emb
        .select(col("vec_id"), explode(array(bandStructs: _*)).as("s"))
        .select(col("vec_id"), col("s.band").as("band"), col("s.key").as("key"),
          col("s.flip").as("flip"))
    }

  private def oracleNormTable(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame =
    oracleNormsMemo(s, d) {
      val emb = graft.Tables.embeddings(s, d)
      emb.select(col("vec_id"), Similarity.decVec(col("embedding")).as("de"))
        .select(col("vec_id"), col("de"),
          decDot(col("de"), col("de"))
            .cast(org.apache.spark.sql.types.DoubleType).as("nrm"))
    }

  /** Exact-decimal cosine verify at ≥ 0.3 over an (a, b) candidate
    * frame — the shared tail of both oracle-twin queries. */
  private def verifyPairs(s: org.apache.spark.sql.SparkSession, d: String,
                          cand: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val withNorm = oracleNormTable(s, d)
    val ea = withNorm.select(col("vec_id").as("a"), col("de").as("ae"), col("nrm").as("na"))
    val eb = withNorm.select(col("vec_id").as("b"), col("de").as("be"), col("nrm").as("nb"))
    cand.join(ea, "a").join(eb, "b")
      .select(col("a"), col("b"),
        Similarity.cosMicrosPre(decDot(col("ae"), col("be")), col("na"), col("nb"))
          .as("sim_micros"))
      .filter(col("sim_micros") >= 300000L)
      .orderBy("a", "b")
  }

  val qSignlshNeardup: (org.apache.spark.sql.SparkSession, String) => DataFrame = (s, d) => {
    val keys = oracleKeyTable(s, d)
    val cand = keys.as("pa")
      .join(keys.as("pb"),
        col("pa.band") === col("pb.band") && col("pa.key") === col("pb.key") &&
          col("pa.vec_id") < col("pb.vec_id"))
      .select(col("pa.vec_id").as("a"), col("pb.vec_id").as("b"))
      .distinct()
    verifyPairs(s, d, cand)
  }

  /** Multiprobe sign-LSH through the oracle — the last branch of the
    * production ANN path ([[candidatePairs]]'s `multiprobe > 0` arm)
    * proven decimal-exact against DuckDB. Per (vector, band), the probe
    * flips the single lowest-|margin| signature bit (the flip most
    * likely to recover a near-miss pair); candidates are the exact
    * same-bucket pairs UNION the asymmetric probe-bucket hits. Margins
    * are exact decimals, so the flip-bit choice is engine-identical
    * (ties break on bit index — also deterministic); verification is
    * the same exact-decimal cosine at ≥ 0.3 as [[qSignlshNeardup]],
    * making the result a strict superset of the exact-bucket query's. */
  val qSignlshMultiprobe: (org.apache.spark.sql.SparkSession, String) => DataFrame = (s, d) => {
    // the signature pipeline (and its four-consumer checkpoint) now
    // comes from the memoized spine shared with qSignlshNeardup (r16)
    val keys = oracleKeyTable(s, d)
    val exact = keys.as("pa")
      .join(keys.as("pb"),
        col("pa.band") === col("pb.band") && col("pa.key") === col("pb.key") &&
          col("pa.vec_id") < col("pb.vec_id"))
      .select(col("pa.vec_id").as("a"), col("pb.vec_id").as("b"))
    val probes = keys.select(col("vec_id").as("qa"), col("band"),
      col("key").bitwiseXOR(col("flip")).as("key"))
    val hits = probes
      .join(keys.select(col("vec_id").as("qb"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("qa") =!= col("qb"))
      .select(least(col("qa"), col("qb")).as("a"),
        greatest(col("qa"), col("qb")).as("b"))
    val cand = exact.unionAll(hits).distinct()
    verifyPairs(s, d, cand)
  }

  /** Shared oracle CTE prefix: seeded weights as a VALUES table of
    * exact decimal literals, exploded embedding elements, per-(vector,
    * band, bit) exact decimal dots. */
  private def dotsCtePrefix: String = {
    val planes = decimalHyperplanes(OracleParams, 64)
    val rows = for {
      b <- 0 until OracleParams.bands
      i <- 0 until OracleParams.bits
      dIx <- 0 until 64
    } yield s"($b, $i, ${dIx + 1}, ${planes(b)(i)(dIx).toPlainString})"
    s"""WITH w(band, bit, i, wv) AS (VALUES ${rows.mkString(", ")}),
       |$bnCte,
       |el AS (
       |  SELECT vec_id, i, CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(12,8)) AS x
       |  FROM (SELECT vec_id, embedding, unnest(generate_series(1, 64)) AS i
       |        FROM embeddings)),
       |dots AS (
       |  SELECT e.vec_id, w.band, w.bit, SUM(e.x * CAST(w.wv AS DECIMAL(12,8))) AS dot
       |  FROM el e JOIN w ON e.i = w.i AND w.bit < (SELECT v FROM bn)
       |  GROUP BY 1, 2, 3),
       |keys AS (
       |  SELECT vec_id, band,
       |    CAST(SUM(CASE WHEN dot >= 0 THEN 1 << bit ELSE 0 END) AS BIGINT) AS key
       |  FROM dots GROUP BY 1, 2),""".stripMargin
  }

  /** Shared oracle suffix: exact-decimal cosine verify over `pairs`. */
  private val verifySqlSuffix: String =
    s"""nrm AS (SELECT vec_id, SUM(x*x) AS nrm FROM el GROUP BY vec_id),
       |pd AS (
       |  SELECT p.a, p.b, SUM(ea.x * eb.x) AS dot
       |  FROM pairs p
       |  JOIN el ea ON p.a = ea.vec_id
       |  JOIN el eb ON p.b = eb.vec_id AND ea.i = eb.i
       |  GROUP BY 1, 2)
       |SELECT a, b, sim_micros FROM (
       |  SELECT d.a, d.b,
       |    CAST(CAST(CAST(d.dot AS DOUBLE) / sqrt(CAST(na.nrm AS DOUBLE) * CAST(nb.nrm AS DOUBLE)) AS DECIMAL(10,6)) * 1000000 AS BIGINT) AS sim_micros
       |  FROM pd d
       |  JOIN nrm na ON d.a = na.vec_id
       |  JOIN nrm nb ON d.b = nb.vec_id)
       |WHERE sim_micros >= 300000 ORDER BY a, b""".stripMargin

  /** DuckDB twin of [[qSignlshNeardup]], generated from the SAME seeded
    * decimal hyperplanes. */
  private def oracleSqlText: String =
    s"""$dotsCtePrefix
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS a, b.vec_id AS b
       |  FROM keys a JOIN keys b
       |    ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id),
       |$verifySqlSuffix""".stripMargin

  /** DuckDB twin of [[qSignlshMultiprobe]]: the flip bit is the
    * row_number()=1 bit under (abs(dot), bit) — the same total order as
    * the Spark struct sort. */
  private def multiprobeSqlText: String =
    s"""$dotsCtePrefix
       |fb AS (
       |  SELECT vec_id, band, CAST(1 << bit AS BIGINT) AS flip FROM (
       |    SELECT vec_id, band, bit,
       |      row_number() OVER (PARTITION BY vec_id, band ORDER BY abs(dot), bit) AS rn
       |    FROM dots) WHERE rn = 1),
       |k2 AS (
       |  SELECT k.vec_id, k.band, k.key, xor(k.key, f.flip) AS pkey
       |  FROM keys k JOIN fb f ON k.vec_id = f.vec_id AND k.band = f.band),
       |pairs AS (
       |  SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b FROM (
       |    SELECT a.vec_id AS x, b.vec_id AS y
       |    FROM k2 a JOIN k2 b
       |      ON a.band = b.band AND a.key = b.key AND a.vec_id < b.vec_id
       |    UNION ALL
       |    SELECT a.vec_id, b.vec_id
       |    FROM k2 a JOIN k2 b
       |      ON a.band = b.band AND a.pkey = b.key AND a.vec_id <> b.vec_id)),
       |$verifySqlSuffix""".stripMargin

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map(
      "q_signlsh_neardup" -> qSignlshNeardup,
      "q_signlsh_multiprobe" -> qSignlshMultiprobe)

  val oracle: Map[String, String] = Map(
    "q_signlsh_neardup" -> oracleSqlText,
    "q_signlsh_multiprobe" -> multiprobeSqlText)

  /** End-to-end near-dup: candidates → float-cosine verify → threshold.
    * Returns (a, b, sim). The verify joins are shuffle joins on vec_id;
    * candidate volume is ~n·targetBucket·bands/2, linear in n. */
  def neardup(corpus: DataFrame, p: Params, simThreshold: Double,
      dim: Int = 64, saltBuckets: Int = 8): DataFrame = {
    def dotF(a: Column, b: Column): Column = Similarity.dotFloat(a, b)
    val cand = candidatePairs(corpus, p, dim, saltBuckets)
    // norms once per vector — one dot per candidate pair, not three
    val withNorm = corpus.select(col("vec_id"), col("embedding"),
      sqrt(dotF(col("embedding"), col("embedding"))).as("nrm"))
    val ea = withNorm.select(col("vec_id").as("a"), col("embedding").as("ae"),
      col("nrm").as("na"))
    val eb = withNorm.select(col("vec_id").as("b"), col("embedding").as("be"),
      col("nrm").as("nb"))
    cand.join(ea, "a").join(eb, "b")
      .select(col("a"), col("b"),
        (dotF(col("ae"), col("be")) / (col("na") * col("nb"))).as("sim"))
      .filter(col("sim") >= simThreshold)
  }
}
