package graft

import java.math.{BigDecimal => JBig, MathContext, RoundingMode}

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** [[Similarity.qMmrRerank]] semantics: a full sequential replay of the
  * greedy λ=0.7 selection (same decimal/micros arithmetic as the
  * engine) on a planted fixture, plus the diversity property the
  * operator exists for — the near-duplicate of the top hit is DEFERRED
  * below a less-relevant-but-novel document, then admitted once
  * novelty is exhausted. */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  // q(0)=e1; A(10) and B(11) identical (cos(A,B)=1, rel .832050);
  // C(12) mirror of A (rel .832050? no — same rel, azimuth-opposed:
  // sim(C,A)=.384615); D(13), E(14) weaker; 1..3 junk probes.
  private val dim = 64
  private def v(parts: (Int, Float)*): Seq[Float] = {
    val a = Array.fill(dim)(0.0f)
    parts.foreach { case (i, x) => a(i) = x }
    a.toSeq
  }
  private val vecs: Seq[(Long, Seq[Float])] = Seq(
    0L -> v(0 -> 1.0f),
    1L -> v(60 -> 1.0f),
    2L -> v(61 -> 1.0f),
    3L -> v(62 -> 1.0f),
    10L -> v(0 -> 0.75f, 1 -> 0.5f),
    11L -> v(0 -> 0.75f, 1 -> 0.5f),
    12L -> v(0 -> 0.75f, 1 -> -0.5f),
    13L -> v(0 -> 0.5f, 2 -> 0.75f),
    14L -> v(0 -> 0.25f, 3 -> 0.25f))

  /** decVec + decDot + cosMicrosPre replayed: float → double →
    * DECIMAL(12,8) HALF_UP, exact decimal dot, double divide,
    * DECIMAL(10,6) HALF_UP micros. */
  private def dec(x: Float): JBig =
    new JBig(x.toDouble, MathContext.UNLIMITED).setScale(8, RoundingMode.HALF_UP)
  private def dot(a: Seq[Float], b: Seq[Float]): JBig =
    a.zip(b).map { case (x, y) => dec(x).multiply(dec(y)) }
      .foldLeft(JBig.ZERO)(_.add(_))
  private def cosMicros(a: Seq[Float], b: Seq[Float], na: Double, nb: Double): Long = {
    val c = dot(a, b).doubleValue() / math.sqrt(na * nb)
    new JBig(c, MathContext.UNLIMITED).setScale(6, RoundingMode.HALF_UP)
      .movePointRight(6).longValueExact()
  }

  test("mmr: greedy replay matches; near-dup deferred below the novel hit") {
    val dir = java.nio.file.Files.createTempDirectory("mmr").toString
    vecs.map { case (id, e) => (id, e, 1) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // sequential truth, per probe
    val byId = vecs.toMap
    val norms = vecs.map { case (id, e) => id -> dot(e, e).doubleValue() }.toMap
    val expected = (0L until 4L).flatMap { qid =>
      val rels = vecs.collect { case (id, e) if id != qid =>
        id -> cosMicros(byId(qid), e, norms(qid), norms(id)) }
      val pool = rels.sortBy { case (id, r) => (-r, id) }.take(10)
      var selected = Vector.empty[(Long, Long, Long)] // (nid, rel, score)
      for (r <- 1 to 5) {
        val pick = pool.filterNot(p => selected.exists(_._1 == p._1)).map {
          case (nid, rel) =>
            val msim = if (selected.isEmpty) 0L
              else selected.map(s =>
                cosMicros(byId(nid), byId(s._1), norms(nid), norms(s._1))).max
            (nid, rel, (7L * rel - 3L * msim + 10000000L) / 10L - 1000000L)
        }.minBy { case (nid, _, score) => (-score, nid) }
        selected :+= pick
      }
      selected.zipWithIndex.map { case ((nid, rel, score), i) =>
        (qid, i + 1L, nid, rel, score) }
    }

    val got = Similarity.qMmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("rel_micros"), r.getAs[Long]("score_micros"))).toSeq
    assert(got === expected)

    // the property: pure relevance would rank the twin 11 right after
    // 10 (identical vector, identical rel); MMR defers it below BOTH
    // novel candidates — the azimuth-opposed 12 and the off-axis 14
    // (cosine is scale-invariant: rel(14) = .7071, not .25)
    val order0 = got.filter(_._1 == 0L).sortBy(_._2).map(_._3)
    assert(order0 == Seq(10L, 12L, 14L, 11L, 13L), s"got $order0")
  }
}
