package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pretrain, Sequences}

/** Invariants of the pretraining-prep family (BPE merge apply, span
  * corruption, vocab overlap) and the conversion-rate rollup
  * (sf0.001 fixtures). */
class PretrainSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bpe merge: every doc rewritten with the one corpus-wide winning pair") {
    val r = Pretrain.qBpeMerge(spark, sf).collect()
    assert(r.nonEmpty)
    // one global pair applied everywhere
    assert(r.map(_.getAs[String]("pair")).distinct.length === 1)
    val pair = r.head.getAs[String]("pair")
    assert(pair.length === 2)
    // new_len + n_merges = original length (each merge removes 1 char)
    val orig = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    r.foreach { x =>
      assert(x.getAs[Long]("new_len") + x.getAs[Long]("n_merges")
        === orig(x.getAs[Long]("doc_id")))
    }
    // the most frequent pair must actually occur somewhere
    assert(r.map(_.getAs[Long]("n_merges")).sum > 0)
  }

  test("span corruption: counts consistent, ~10% density, spans bound masks") {
    val r = Pretrain.qSpanCorruption(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val (nt, nm, ns) = (x.getAs[Long]("n_tokens"), x.getAs[Long]("n_masked"),
        x.getAs[Long]("n_spans"))
      assert(nm <= nt)
      // a masked span covers at most 3 tokens
      assert(nm <= ns * 3 && (ns == 0 || nm >= ns))
      assert(x.getAs[Long]("mask_permille") === nm * 1000 / nt)
    }
    // corpus-level density near the designed 10% (loose band: spans
    // are whole-masked so per-doc variance is high)
    val tot = r.map(_.getAs[Long]("n_tokens")).sum
    val msk = r.map(_.getAs[Long]("n_masked")).sum
    assert(msk * 1000 / tot > 50 && msk * 1000 / tot < 200)
  }

  test("vocab overlap: symmetric-free pair list, jaccard within bounds") {
    val r = Pretrain.qVocabOverlap(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[String]("src_a") < x.getAs[String]("src_b"))
      val (na, nb, nc) = (x.getAs[Long]("n_a"), x.getAs[Long]("n_b"),
        x.getAs[Long]("n_common"))
      assert(nc <= math.min(na, nb))
      val j = x.getAs[Long]("jaccard_permille")
      assert(j >= 0 && j <= 1000)
    }
  }

  test("conversion rate: smoothing keeps rates strictly inside (0, 1000]") {
    val r = Sequences.qConversionRate(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      val rate = x.getAs[Long]("rate_permille")
      assert(rate > 0) // +1 numerator: never zero
      // n_purchase <= n_view + 1 would bound at 1000; just sanity-bound
      assert(rate <= (x.getAs[Long]("n_purchase") + 1) * 1000 / 2 || rate <= 1000L ||
        x.getAs[Long]("n_view") === 0L)
    }
    // totals conserve against the raw stream
    val ev = Tables.events(spark, sf)
    assert(r.map(_.getAs[Long]("n_view")).sum ===
      ev.filter(col("event_type") === "view").count())
    assert(r.map(_.getAs[Long]("n_purchase")).sum ===
      ev.filter(col("event_type") === "purchase").count())
  }

  test("domain mix round: template-y source down-weighted, weights renormalize") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory(Paths.get("target"), "mix").toString
    import spark.implicits._
    // 'tmpl' is one word repeated (surprisal ~ log2(N/c) small); 'div'
    // is all-distinct words (high surprisal) — the MW step must push
    // mass from tmpl to div
    val tmpl = (1L to 6L).map(i => (i, Seq.fill(20)("aaa").mkString(" "), "en", "tmpl"))
    val div = (7L to 12L).map(i =>
      (i, (1 to 20).map(j => s"w${i}_$j").mkString(" "), "en", "div"))
    (tmpl ++ div).map { case (i, t, l, src) => (i, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Pretrain.qDomainMixRound(spark, dir).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    assert(r.keySet === Set("tmpl", "div"))
    assert(r("div").getAs[Long]("surprisal_micro") >
      r("tmpl").getAs[Long]("surprisal_micro"))
    assert(r("div").getAs[Long]("factor_permille") >
      r("tmpl").getAs[Long]("factor_permille"))
    r.values.foreach { x =>
      val f = x.getAs[Long]("factor_permille")
      assert(f >= 500L && f <= 2000L)
    }
    // renormalized permilles sum to 1000 up to per-source flooring
    val w1 = r.values.map(_.getAs[Long]("w1_permille")).sum
    assert(w1 <= 1000L && w1 > 1000L - r.size)
    // token-weighted excess cancels up to integer-division slack
    val slack = r.values.map(_.getAs[Long]("n_tokens")).sum
    val bal = r.values.map(x =>
      BigInt(x.getAs[Long]("n_tokens")) * x.getAs[Long]("excess_micro")).sum
    assert(bal.abs < BigInt(slack) * 2, s"weighted excess $bal vs slack $slack")
  }

  test("domain mix round on sf fixture: weights renormalize; factors clamped") {
    val r = Pretrain.qDomainMixRound(spark, sf).collect()
    assert(r.nonEmpty)
    val w1 = r.map(_.getAs[Long]("w1_permille")).sum
    assert(w1 <= 1000L && w1 > 1000L - r.length)
    r.foreach { x =>
      val f = x.getAs[Long]("factor_permille")
      assert(f >= 500L && f <= 2000L)
      assert(x.getAs[Long]("surprisal_micro") >= 0L)
    }
  }
}
