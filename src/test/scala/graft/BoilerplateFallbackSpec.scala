package graft

import java.nio.file.Files

import graft.operators.TextStats

/** qBoilerplateStrip's anti join must be RUNTIME-SIZED, not forced:
  * on template-heavy corpora the df≥3 block set grows with corpus
  * vocabulary, and a hard-coded broadcast hint would OOM executors at
  * 100× scale. This spec pins both sides of the adaptive behavior on a
  * template-heavy fixture (every document shares a 20-word template
  * prefix, so two-thirds of all distinct blocks are boilerplate):
  *
  *  - with broadcast disabled (the stand-in for "boiler set exceeds
  *    the broadcast threshold"), the plan must FALL BACK to a shuffled
  *    anti join — a forced broadcast() hint would override the
  *    threshold and this assertion would catch it;
  *  - at default thresholds the tiny boiler set must still BROADCAST
  *    (AQE/static sizing picks it) — the fallback must not have been
  *    bought by always shuffling;
  *  - the rows are identical either way.
  */
class BoilerplateFallbackSpec extends SparkSpec {

  test("boilerplate anti join: shuffled when broadcast is off, broadcast when small, same rows") {
    import spark.implicits._
    // 30 docs: a shared 20-word template prefix (blocks 1-2 of every
    // doc, df=30 → boilerplate) + 10 unique words (block 3, df=1)
    val template = (1 to 20).map(i => s"t$i").mkString(" ")
    val rows = (0L until 30L).map { id =>
      val unique = (1 to 10).map(i => s"u${id}_$i").mkString(" ")
      val text = s"$template $unique"
      (id, text, "en", "web", text.length.toLong)
    }
    val dir = Files.createTempDirectory("graft-boiler-spec").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap

    def planOf(run: () => org.apache.spark.sql.DataFrame) = {
      val q = run()
      val out = q.collect()
      (q.queryExecution.executedPlan.toString, out)
    }

    val (shuffledPlan, shuffledRows) =
      try {
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        planOf(() => TextStats.qBoilerplateStrip(spark, dir))
      } finally saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    assert(shuffledPlan.contains("LeftAnti"), s"anti join missing:\n$shuffledPlan")
    assert(!shuffledPlan.contains("BroadcastHashJoin"),
      s"broadcast is forced — a large boiler set would OOM:\n$shuffledPlan")

    val (bcastPlan, bcastRows) = planOf(() => TextStats.qBoilerplateStrip(spark, dir))
    assert(bcastPlan.contains("BroadcastHashJoin"),
      s"small boiler set should broadcast under default thresholds:\n$bcastPlan")

    assert(shuffledRows.toSeq == bcastRows.toSeq,
      "join strategy must not change the result")
    // semantic pin: template blocks stripped, unique block survives
    val byDoc = bcastRows.map(r =>
      r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_kept"), r.getAs[String]("clean_text"))).toMap
    assert(byDoc.size == 30)
    assert(byDoc(7L)._1 == 1L && byDoc(7L)._2 == (1 to 10).map(i => s"u7_$i").mkString(" "))
  }
}
