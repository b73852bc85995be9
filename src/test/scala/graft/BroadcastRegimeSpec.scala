package graft

/** r9 "weak" flags: the exact-verify joins of the near-dup pipeline
  * (qNgramJaccard's candDocs/cand, qMinhashEstimate, lshPrecisionFrom's
  * semi-filter) and qRetrievalEval's (vec_id,label) joins used to carry
  * hard `broadcast()` hints. All of those frames are corpus- or
  * candidate-graph-sized — unbounded at 100 TB, where a forced
  * broadcast is a driver/executor OOM. The hints were dropped so AQE's
  * runtime size stats decide. This spec pins BOTH regimes, the
  * BoilerplateFallbackSpec pattern widened to the four flagged queries:
  *
  *  - with broadcast thresholds at -1 (the stand-in for "frame exceeds
  *    the broadcast threshold") the plans must contain NO
  *    BroadcastHashJoin beyond the bounded ones listed below — any
  *    re-introduced `broadcast()` hint on an equi-join would override
  *    the threshold and trip the assertion;
  *  - at default thresholds AQE must still pick broadcast for the
  *    actually-small frames (the fallback must not have been bought by
  *    always shuffling);
  *  - rows are identical either way.
  *
  * Bounded exception: q_retrieval_eval keeps exactly TWO forced
  * broadcast equi-joins — [[graft.operators.Relevance]]'s sparseTopK
  * broadcasts its probe frame, which is 64 rows BY CONSTRUCTION
  * (nProbes literal), not corpus-scaled; forcing those is correct at
  * any scale.
  */
class BroadcastRegimeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // query -> forced-broadcast equi-joins that remain when thresholds
  // are -1 (all provably bounded frames; see scaladoc).
  // q_ngram_jaccard's verify pipeline moved into the memoized pair
  // spine (r16) — its own plan is a checkpoint read now, so the
  // regime pin targets the spine COMPUTE via the test-visible
  // accessor below (same joins, same intent).
  private val allowedForced = Map(
    "q_minhash_estimate" -> 0,
    "q_lsh_precision" -> 0,
    "q_retrieval_eval" -> 2)

  private def planCounts(df: org.apache.spark.sql.DataFrame): (Int, Int, Seq[String]) = {
    // sorted: the jaccard SPINE ends in a plain select (no orderBy), so
    // its row order is plan-dependent across the two regimes (ADVICE
    // r16). The comparison is set-equality in intent; sorting both
    // sides makes it order-insensitive without weakening it.
    val rows = df.collect().map(_.toString).toSeq.sorted
    val plan = df.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    ("BroadcastHashJoin".r.findAllIn(plan).length,
      "SortMergeJoin".r.findAllIn(plan).length, rows)
  }

  private def runOne(name: String): (Int, Int, Seq[String]) =
    planCounts(SparkEntry.queries(name)(spark, sf))

  private def runJaccardSpine(): (Int, Int, Seq[String]) =
    planCounts(graft.operators.Dedup.computeNgramJaccardPairs(spark, sf))

  test("near-dup + retrieval-eval joins: runtime-sized, not forced; rows identical") {
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap

    val (noBcast, spineNoBcast) =
      try {
        keys.foreach(conf.set(_, "-1"))
        (allowedForced.keys.map(n => n -> runOne(n)).toMap, runJaccardSpine())
      } finally saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }

    allowedForced.foreach { case (name, allowed) =>
      val (bhj, smj, _) = noBcast(name)
      assert(bhj == allowed,
        s"$name: $bhj forced broadcast equi-joins with thresholds=-1 " +
          s"(allowed bounded: $allowed) — an unbounded frame is hinted again")
      assert(smj > 0, s"$name: expected shuffled fallback joins in the plan")
    }
    assert(spineNoBcast._1 == 0,
      s"jaccard spine: ${spineNoBcast._1} forced broadcast equi-joins " +
        "with thresholds=-1 — an unbounded frame is hinted again")
    assert(spineNoBcast._2 > 0,
      "jaccard spine: expected shuffled fallback joins in the plan")

    allowedForced.keys.foreach { name =>
      val (bhj, _, rows) = runOne(name)
      assert(bhj > allowedForced(name),
        s"$name: AQE should broadcast the small frames at default thresholds")
      assert(rows == noBcast(name)._3,
        s"$name: join strategy must not change the result")
    }
    val spineDefault = runJaccardSpine()
    assert(spineDefault._1 > 0,
      "jaccard spine: AQE should broadcast the small frames at default thresholds")
    assert(spineDefault._3 == spineNoBcast._3,
      "jaccard spine: join strategy must not change the result")
  }
}
