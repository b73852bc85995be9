package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a ×N scale fixture from an existing sf directory — the
  * measured decade of headroom behind PERF.md §"sf1 scale proof".
  *
  * `documents`/`embeddings`/`events` are unioned N times with shifted
  * ids; the other tables copy verbatim (dimension tables don't drive
  * the dedup/ANN/suffix costs under test). Replica perturbation is
  * chosen so the SCALE SHAPE stays honest:
  *
  *   - documents: replica i>0 maps a–z through a per-replica AFFINE
  *     letter permutation x → aᵢ·x + bᵢ (mod 26), with bᵢ = i mod 26
  *     (the rotation axis) and aᵢ cycling the 12 units of ℤ₂₆ (the
  *     second axis, added for the r15 ×100 directive). 12 × 26 = 312
  *     distinct permutations, so the map is INJECTIVE in the replica
  *     index for n ≤ 312 — enforced — and a ×100 fixture now comes
  *     from ONE invocation instead of a chained ×10∘×10 (whose
  *     composed rotations collided: i+j mod 26 repeats with
  *     multiplicity 1,2,…,10,…,2,1 — the byte-identical-clone
  *     artifact the r15 decade proof had to read around). Two
  *     distinct affine maps agree on at most 2 of 26 letters, so any
  *     text with ≥3 distinct letters differs across replicas.
  *     Identical text across replicas would turn every document into
  *     an N-clone near-dup cluster — candidate pairs would grow
  *     ~N²/2 per doc and the "10× data" run would really measure a
  *     denser duplicate graph. (An earlier vowel-only rotation had
  *     just 5 distinct values, so replicas i and i+5 were
  *     byte-identical — the exact trap.) Each affine map is a
  *     bijection on letters, so each replica's INTERNAL clone/shingle
  *     structure is preserved exactly while every letter-bearing gram
  *     differs across replicas — the corpus-level dup fraction
  *     matches the base corpus, which is what "N× more of the same
  *     kind of data" means. For i ≤ 25 the maps are the pure
  *     rotations (aᵢ = 1), so existing ×10 fixtures are unchanged.
  *   - embeddings: deterministic per-(vec, dim, replica) jitter of
  *     ~1e-3 magnitude — scaling by a constant would preserve every
  *     sign and land all replicas in the same sign-LSH buckets with
  *     identical neighbor structure (an N× bucket-occupancy lie).
  *   - events: ids/user ids shifted, timestamps offset by the replica
  *     index times the base span, so sessionization/windows see more
  *     users and more time, not N overlaid copies of one day.
  *
  * CHAINING CAVEAT (r15, found by the ×100 decade proof): building
  * ×(a·b) as ScaleFixture(ScaleFixture(src, a), b) COMPOSES the
  * letter permutations, and affine maps compose to affine maps —
  * chain replicas can collide exactly as the r15 rotation chains did
  * (composition is NOT injective in the pair (i, j)), so the product
  * fixture may contain byte-identical text copies the
  * single-invocation fixture is designed to avoid. Never chain:
  * with the affine axis a single invocation covers n ≤ 312 (×100 and
  * beyond); scales past that need a third perturbation axis.
  *
  * Usage: runMain graft.ScaleFixture <srcSfDir> <outDir> <N>
  */
object ScaleFixture {

  def main(args: Array[String]): Unit = {
    val Array(src, out, nStr) = args.take(3)
    val n = nStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-fixture")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try build(spark, src, out, n)
    finally spark.stop()
  }

  def build(spark: SparkSession, src: String, out: String, n: Int): Unit = {
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val ev = spark.read.parquet(s"$src/events.parquet")
    val docShift = 1L + docs.agg(max("doc_id")).head().getLong(0)
    val vecShift = 1L + emb.agg(max("vec_id")).head().getLong(0)
    val evAgg = ev.agg(max("event_id"), max("user_id"),
      max(unix_micros(col("ts").cast("timestamp"))), min(unix_micros(col("ts").cast("timestamp")))).head()
    val (evShift, userShift) = (1L + evAgg.getLong(0), 1L + evAgg.getLong(1))
    val tsSpanMicros = 1L + evAgg.getLong(2) - evAgg.getLong(3)

    def replicas(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until n).map(i => f(df, i)).reduce(_ unionAll _)

    require(n <= 312, s"ScaleFixture supports n <= 312 (12 units × 26 " +
      s"shifts = 312 distinct affine letter permutations keep the " +
      s"perturbation injective in the replica index); got n=$n")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    // the 12 units of Z26, identity first so replicas 0..25 are the
    // pure rotations (back-compatible with pre-r16 ×10 fixtures)
    val units = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    replicas(docs) { (d, i) =>
      val (a, b) = (units((i / 26) % 12), i % 26)
      val image = alpha.map(c => alpha((a * (c - 'a') + b) % 26)).mkString
      d.select(
        (col("doc_id") + lit(i * docShift)).as("doc_id"),
        (if (i == 0) col("text")
         else translate(col("text"), alpha, image)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.repartition(32).write.mode(SaveMode.Overwrite)
      .parquet(s"$out/documents.parquet")

    replicas(emb) { (e, i) =>
      e.select(
        (col("vec_id") + lit(i * vecShift)).as("vec_id"),
        (if (i == 0) col("embedding")
         else expr(s"""transform(embedding, (x, j) ->
              x + cast(pmod(hash(vec_id, j, $i), 2000) - 1000 as float) / 1000000.0f)"""))
          .as("embedding"),
        col("label"))
    }.repartition(32).write.mode(SaveMode.Overwrite)
      .parquet(s"$out/embeddings.parquet")

    replicas(ev) { (e, i) =>
      e.select(
        (col("event_id") + lit(i * evShift)).as("event_id"),
        timestamp_micros(unix_micros(col("ts").cast("timestamp"))
          + lit(i * tsSpanMicros)).cast("timestamp_ntz").as("ts"),
        (col("user_id") + lit(i * userShift)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.repartition(32).write.mode(SaveMode.Overwrite)
      .parquet(s"$out/events.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
    }
    println(s"[scale-fixture] wrote ${n}x of $src to $out")
  }
}
