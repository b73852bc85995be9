package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.CorpusOps

/** Property check for the winnowing pipeline: on random corpora over a
  * small shared vocabulary (so cross-document gram collisions are
  * plentiful), the distributed explode+lead+window plan agrees exactly
  * with a brute-force Scala reference (3-gram md5, window-4 minima,
  * per-doc distinct, shared-by-≥2 counts) — and the Schleimer et al.
  * guarantee holds for a planted passage: any two documents sharing a
  * ≥6-word run share at least one fingerprint. */
class WinnowingPropertySpec extends SparkSpec {

  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Reference fingerprints of one document. */
  private def refFps(words: Seq[String]): Set[String] =
    if (words.length < 6) Set.empty
    else words.sliding(3).map(g => md5hex(g.mkString(" ")))
      .toVector.sliding(4).map(_.min).toSet

  test("winnowing ≡ brute-force reference on random corpora; planted passage guarantee") {
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get

    val vocab = (0 until 30).map(i => s"w$i")
    val docGen = Gen.chooseNum(6, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)))

    (0 until 3).foreach { round =>
      val docs: Seq[(Long, Vector[String])] =
        (0 until 20).map { i =>
          (i.toLong, sample(docGen, 100L * round + i).toVector)
        }
      // plant one shared 8-word passage into docs 0 and 1 at
      // (deterministic) random offsets — the ≥6-word guarantee target
      val passage = sample(Gen.listOfN(8, Gen.oneOf(vocab)), 999L + round).toVector
      val planted = docs.map {
        case (0L, ws) => (0L, ws.take(3) ++ passage ++ ws.drop(3))
        case (1L, ws) => (1L, ws.take(7) ++ passage ++ ws.drop(7))
        case other => other
      }

      val dir = java.nio.file.Files.createTempDirectory("winprop").toString
      planted.map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en"))
        .withColumn("source", lit("prop"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val got = CorpusOps.qWinnowing(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq

      val perDoc = planted.map { case (id, ws) => id -> refFps(ws) }
      val want = perDoc.flatMap { case (id, f) => f.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong)
        .filter(_._2 >= 2L).toSeq
        .sortBy { case (fp, n) => (-n, fp) }
        .take(100)

      assert(got === want, s"round $round: distributed != reference")
      // the planted ≥6-word passage must yield a shared fingerprint
      assert((perDoc(0)._2 intersect perDoc(1)._2).nonEmpty,
        s"round $round: planted passage produced no shared fingerprint")
      assert(got.nonEmpty)
    }
  }
}
