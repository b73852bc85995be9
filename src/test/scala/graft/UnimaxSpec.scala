package graft

import org.apache.spark.sql.functions._

import graft.operators.Pretrain

/** Pins [[Pretrain.qUnimaxMix]]'s closed-form waterfill against the
  * sequential greedy it replaces, plus the degenerate regimes the
  * closed form must handle (all-capped, single-source, remainder
  * assignment). The sf replay proves Spark↔DuckDB equality; these
  * prove the ALLOCATION RULE is the intended one. */
class UnimaxSpec extends SparkSpec {

  import spark.implicits._

  /** One source per entry: `tokens` whitespace tokens exactly. */
  private def writeSources(tokens: (String, Int)*): String = {
    val dir = java.nio.file.Files.createTempDirectory("unimax").toString
    tokens.zipWithIndex.map { case ((src, t), i) =>
      (i.toLong, Seq.fill(t)("w").mkString(" "), "en", src,
        (2 * t - 1).toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** The sequential greedy the closed form replaces: ascending by
    * (cap, source), each source takes min(cap, remaining/left). */
  private def greedy(caps: Seq[(String, Long)], b: Long): Map[String, Long] = {
    var rem = b
    var left = caps.length
    val out = scala.collection.mutable.Map.empty[String, Long]
    caps.sortBy { case (s, c) => (c, s) }.foreach { case (s, c) =>
      val a = math.min(c, rem / left)
      out(s) = a; rem -= a; left -= 1
    }
    out.toMap
  }

  test("mixed regime: budget exhausted, caps bind small sources, greedy agrees") {
    // caps asc 50,125,500,562,625,1250 vs B=2988: m=5, sf uncapped
    val sizes = Seq("sa" -> 40, "sb" -> 100, "sc" -> 400, "sd" -> 450,
      "se" -> 500, "sf" -> 1000)
    val dir = writeSources(sizes: _*)
    val rows = Pretrain.qUnimaxMix(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("cap_tokens"),
          r.getAs[Long]("allocated"), r.getAs[Long]("capped")))).toMap
    val total = sizes.map(_._2.toLong).sum
    val b = total * 1200 / 1000
    assert(rows.values.map(_._3).sum === b, "allocation exhausts the budget")
    rows.foreach { case (s, (nt, cap, alloc, capped)) =>
      assert(cap === nt * 1250 / 1000, s)
      assert(alloc <= cap, s"$s allocation respects its cap")
      if (capped == 1L) assert(alloc === cap, s"$s capped means alloc = cap")
    }
    assert(rows.values.count(_._4 == 1L) === 5)
    assert(rows("sa")._4 === 1L && rows("sf")._4 === 0L)
    assert(rows("sf")._3 === 1126L) // 2988 - (50+125+500+562+625)
    // per-source equality with the sequential greedy
    val g = greedy(rows.toSeq.map { case (s, v) => (s, v._2) }, b)
    rows.foreach { case (s, v) => assert(g(s) === v._3, s) }
  }

  test("all-capped regime: every source at cap, surplus budget stays unspent") {
    // 3 equal sources, caps 8 each, B = 25: every prefix condition
    // holds (8*3=24, 8*2+8=24, 8+16=24, all <= 25) -> m = n, alloc =
    // cap everywhere, 1 token unspendable under the epoch cap
    val dir = writeSources("s1" -> 7, "s2" -> 7, "s3" -> 7)
    val rows = Pretrain.qUnimaxMix(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("allocated"), r.getAs[Long]("capped")))).toMap
    assert(rows.values.forall(_._2 == 1L), "all sources capped")
    assert(rows.values.forall(_._1 == 8L))
    assert(rows.values.map(_._1).sum === 24L) // < B = 25: cap-bound
  }

  test("single source: cap exceeds budget, gets exactly B, 1.2 epochs") {
    val dir = writeSources("only" -> 100)
    val x = Pretrain.qUnimaxMix(spark, dir).collect().head
    // cap 125 > B 120: condition 125*1+0 <= 120 false -> uncapped
    assert(x.getAs[Long]("capped") === 0L)
    assert(x.getAs[Long]("allocated") === 120L)
    assert(x.getAs[Long]("epochs_milli") === 1200L)
  }

  test("integer remainder spreads +1 over the LAST rem uncapped sources") {
    // caps asc: s1 12 (capped), s2 625, s3 628; B = 1215
    // share (1215-12)/2 = 601 rem 1 -> s2 601, s3 602
    val dir = writeSources("s1" -> 10, "s2" -> 500, "s3" -> 503)
    val rows = Pretrain.qUnimaxMix(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("allocated")).toMap
    assert(rows === Map("s1" -> 12L, "s2" -> 601L, "s3" -> 602L))
    assert(rows.values.sum === 1215L)
  }

  test("equal caps: remainder >= 2 never pushes a source over its cap") {
    // 3 equal sources of 9 tokens: caps 11 each, B = 32; 11*3 = 33 > 32
    // so m = 0, share 32/3 = 10 rem 2 -> alloc 10/11/11 (NOT 10/10/12,
    // which would put the last source at 1333 milli-epochs > the 1250
    // cap). Per-source equality with the sequential greedy included.
    val dir = writeSources("s1" -> 9, "s2" -> 9, "s3" -> 9)
    val rows = Pretrain.qUnimaxMix(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("cap_tokens"), r.getAs[Long]("allocated"),
          r.getAs[Long]("epochs_milli")))).toMap
    assert(rows.map { case (s, v) => s -> v._2 } ===
      Map("s1" -> 10L, "s2" -> 11L, "s3" -> 11L))
    rows.foreach { case (s, (cap, alloc, em)) =>
      assert(alloc <= cap, s"$s allocation respects its cap")
      assert(em <= 1250L, s"$s stays under 1.25 epochs")
    }
    val g = greedy(rows.toSeq.map { case (s, v) => (s, v._1) }, 32L)
    rows.foreach { case (s, v) => assert(g(s) === v._2, s) }
  }

  test("sf fixture: budget respected, caps respected, greedy totals equal") {
    val sf = "/root/testdata/sf0.001"
    val rows = Pretrain.qUnimaxMix(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("cap_tokens"), r.getAs[Long]("allocated")))
    val b = rows.map(_._2).sum * 1200 / 1000
    assert(rows.map(_._4).sum <= b)
    rows.foreach { case (s, _, cap, a) => assert(a <= cap, s) }
    val g = greedy(rows.map(r => (r._1, r._3)), b)
    assert(g.values.sum === rows.map(_._4).sum,
      "closed form and greedy allocate the same total")
  }
}
