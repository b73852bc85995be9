package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** CCNet-style perplexity bucketing: structural semantics on inline
  * fixtures (the oracle gate pins exact values at sf). */
class PplBucketsSpec extends SparkSpec {

  import spark.implicits._

  private def writeDocs(rows: (Long, String, String)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("pplb").toString
    rows.toDF("doc_id", "text", "lang")
      .select(col("doc_id"), col("text"), col("lang"),
        lit("s0").as("source"), length(col("text")).cast("long").as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** The operator's sampling rule, replicated: md5Long("ppl|id") % 20 == 0. */
  private def sampled(id: Long): Boolean = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"ppl|$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 20 == 0
  }

  test("buckets are monotone in perplexity within each language") {
    // 200 docs, mixed common/rare vocabulary → a spread of ppl values;
    // at 5% expected the sample is non-empty w.h.p. for 200 ids
    val docs = (1L to 200L).map { i =>
      val rare = Seq.fill((i % 5).toInt)(s"rare$i").mkString(" ")
      (i, s"common words here $rare", if (i % 2 == 0) "en" else "de")
    }
    assert(docs.map(_._1).exists(sampled), "fixture must contain sampled ids")
    val dir = writeDocs(docs: _*)
    val out = CorpusOps.qPplBuckets(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(out.nonEmpty)
    out.groupBy(_._2).foreach { case (lang, g) =>
      def bpts(b: String) = g.filter(_._4 == b).map(_._3)
      val (h, m, t) = (bpts("head"), bpts("middle"), bpts("tail"))
      assert((h ++ m ++ t).length === g.length, s"unknown bucket label in $lang")
      if (h.nonEmpty && m.nonEmpty) assert(h.max <= m.min, s"$lang head>middle")
      if (m.nonEmpty && t.nonEmpty) assert(m.max < t.min, s"$lang middle>=tail")
      if (h.nonEmpty && t.nonEmpty) assert(h.max < t.min, s"$lang head>=tail")
    }
  }

  test("a language with an empty sample drops out of the output") {
    // lang "xx" uses only UNSAMPLED ids → no thresholds → inner join
    // removes its docs; the sampled lang survives
    val sampledId = (1L to 2000L).find(sampled).get
    val unsampledIds = (1L to 2000L).filterNot(sampled).take(3)
    val rows =
      (sampledId, "aa bb cc", "en") +: unsampledIds.map(i => (i, "dd ee ff", "xx"))
    val dir = writeDocs(rows: _*)
    val out = CorpusOps.qPplBuckets(spark, dir).collect()
    assert(out.map(_.getString(1)).toSet === Set("en"))
  }

  test("plan: threshold join is broadcast; no corpus-side cartesian") {
    val dir = writeDocs((1L to 50L).map(i => (i, s"w$i common", "en")): _*)
    val plan = CorpusOps.qPplBuckets(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
