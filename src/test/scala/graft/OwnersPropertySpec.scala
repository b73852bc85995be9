package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.crawl.Owners

/** Property check for J1: on randomly generated path sets and owner
  * dimensions, the broadcast-UDF ancestor walk and the prefix-explode
  * join plan agree exactly (including null-owner paths and exact-self
  * matches). */
class OwnersPropertySpec extends SparkSpec {

  private val segGen = Gen.oneOf("a", "b", "c", "dd", "e1", ".x")
  private val pathGen = for {
    depth <- Gen.choose(1, 6)
    segs <- Gen.listOfN(depth, segGen)
    abs <- Gen.frequency(4 -> true, 1 -> false) // some relative paths (A7)
  } yield (if (abs) "/" else "") + segs.mkString("/")

  test("findOwner walk ≡ explode+join plan on random trees") {
    import spark.implicits._
    def sample[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

    val paths = sample(pathGen, 400).distinct
    // dim holds deep dirs (so shallow relative paths genuinely miss)
    // plus an owner mapped at the filesystem root — the reference's
    // find_owner consults b'/' before giving up, so the join plan must
    // surface a '/' prefix too
    val dimPairs = sample(pathGen, 60).distinct
      .filter(_.count(_ == '/') >= 3).zipWithIndex
      .map { case (p, i) => (p, s"pi$i") } :+ ("/" -> "piRoot")
    val files = paths.toDF("path")
    val dim = dimPairs.toDF("dir", "pi")

    // plan A: broadcast map + recursive walk (the reference's design)
    val m = dimPairs.toMap
    val viaWalk = paths.map(p => p -> Owners.findOwner(m)(p)).toMap

    // plan B: prefix-explode + broadcast join + deepest-match agg
    val viaJoin = Owners.attachOwnersByJoin(files, dim)
      .collect()
      .map(r => r.getAs[String]("path") -> Option(r.getAs[String]("owner_joined")))
      .toMap

    assert(viaJoin.keySet == viaWalk.keySet)
    paths.foreach { p =>
      assert(viaJoin(p) == viaWalk(p),
        s"mismatch at $p: join=${viaJoin(p)} walk=${viaWalk(p)}")
    }
    // sanity: the generated data actually exercises matches and misses
    assert(viaWalk.values.exists(_.isDefined) && viaWalk.values.exists(_.isEmpty))
  }
}
