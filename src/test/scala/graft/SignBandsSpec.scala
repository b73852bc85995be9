package graft

import org.apache.spark.sql.functions._

import graft.operators.SignLsh

/** [[graft.functions.SignBandsExpr]]: bit-equality against the
  * per-projection column construction it replaced, whole-stage codegen
  * survival at the corpus-sized parameters that broke the old
  * construction, and the malformed-vector edge cases. */
class SignBandsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def oldSignatures(
      corpus: org.apache.spark.sql.DataFrame, p: SignLsh.Params, dim: Int = 64) = {
    val planes = SignLsh.hyperplanes(p, dim)
    val structs = (0 until p.bands).map(l => SignLsh.bandStructColumn(planes, l, p))
    corpus
      .select(col("vec_id"), explode(array(structs: _*)).as("s"))
      .select(col("vec_id"), col("s.band").as("band"), col("s.key").as("key"),
        col("s.flipbits").as("flipbits"))
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, Seq[Long])] =
    df.collect().map { r =>
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getSeq[Long](3))
    }.toSet

  test("bit-identical to the column construction, with and without multiprobe") {
    val emb = Tables.embeddings(spark, sf)
    for (p <- Seq(
        SignLsh.Params(bits = 3, bands = 10, seed = 42L, multiprobe = 0),
        SignLsh.Params(bits = 5, bands = 4, seed = 7L, multiprobe = 2),
        SignLsh.Params(bits = 1, bands = 1, seed = 1L, multiprobe = 1))) {
      val neu = rows(SignLsh.signatures(emb, p))
      val old = rows(oldSignatures(emb, p))
      assert(neu == old, s"signature mismatch at $p: " +
        s"${neu.diff(old).take(3)} vs ${old.diff(neu).take(3)}")
    }
  }

  test("stress-sized params compile under fallback=false and keep whole-stage codegen") {
    val s2 = spark.newSession()
    // the old construction threw 'Code grows beyond 64 KB' here and
    // relied on silent interpreted fallback; forbid the fallback so a
    // regression fails loudly instead of slowly
    s2.conf.set("spark.sql.codegen.fallback", "false")
    import s2.implicits._
    val rnd = new scala.util.Random(99)
    val corpus = (0 until 1000)
      .map(i => (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val p = SignLsh.Params(bits = 12, bands = 12, seed = 42L, multiprobe = 2)
    val sig = SignLsh.signatures(corpus, p)
    assert(sig.count() == 1000L * 12)
    val plan = sig.queryExecution.executedPlan.toString
    assert(plan.contains("sign_bands"), plan.take(500))
    assert(plan.linesIterator.exists(l => l.contains("Generate") || l.contains("sign_bands")),
      plan.take(500))
  }

  test("malformed vectors: wrong length keys to 0 with [1,2,...] flips; NULL embedding emits no bands") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(Seq.fill(64)(0.5f))),          // well-formed
      (2L, Some(Seq.fill(10)(0.5f))),          // wrong length
      (3L, Option.empty[Seq[Float]])           // null embedding
    ).toDF("vec_id", "embedding")
    val p = SignLsh.Params(bits = 4, bands = 2, seed = 42L, multiprobe = 2)
    val out = SignLsh.signatures(df, p).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getSeq[Long](3)))
    assert(!out.exists(_._1 == 3L), "null embedding must emit no band rows")
    val short = out.filter(_._1 == 2L)
    assert(short.length == 2)
    assert(short.forall(r => r._3 == 0L && r._4 == Seq(1L, 2L)),
      s"wrong-length vector: $short")
    assert(out.count(_._1 == 1L) == 2)
  }
}
