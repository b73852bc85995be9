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

  test("dim-depth-bounded walk ≡ unbounded walk, incl. '//' hostile paths") {
    def sample[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))
    // '' segments produce '//' runs — the case where component counting
    // and raw '/'-counting diverge; the bound must stay sound on them
    val hostileSeg = Gen.oneOf("a", "b", "", "c", "dd")
    val hostilePath = for {
      depth <- Gen.choose(1, 8)
      segs <- Gen.listOfN(depth, hostileSeg)
      abs <- Gen.oneOf(true, false)
    } yield (if (abs) "/" else "") + segs.mkString("/")
    val paths = sample(hostilePath, 500).distinct
    val dim = (sample(hostilePath, 40).distinct.zipWithIndex
      .map { case (p, i) => (p, s"pi$i") } :+ ("/" -> "piRoot")).toMap
    val bound = Owners.maxSlashOf(dim.keys)
    paths.foreach { p =>
      assert(Owners.findOwner(dim, bound)(p) == Owners.findOwner(dim)(p),
        s"bounded walk diverges at '$p' (bound=$bound)")
    }
  }

  test("50-level tree: both plans agree, UDF plan never shuffles the fact") {
    import spark.implicits._
    // deep fixture: 200 paths of depth 50 under a fanout of roots; the
    // owners file maps at depths 1-3 only (the realistic shape — human
    // files name projects, not leaves)
    val paths = (0 until 200).map { i =>
      s"/g${i % 4}/p${i % 10}/u$i/" + (4 to 50).map(d => s"d$d").mkString("/")
    }
    val dimPairs = (0 until 4).map(g => (s"/g$g", s"pi_g$g")) ++
      (0 until 10).map(p => (s"/g1/p$p", s"pi_g1p$p")) :+
      ("/g2/p2/u42", "pi_leafish")
    val files = paths.toDF("path")
    val dim = dimPairs.toDF("dir", "pi")

    val viaUdf = files.withColumn("owner", Owners.findOwnerUdf(spark, dim))
    // plan shape: the broadcast-UDF plan is scan→project — zero
    // Exchange, the fact rows never shuffle for attribution
    val plan = viaUdf.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"UDF owner plan must not shuffle:\n$plan")

    val udfMap = viaUdf.collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    val joinMap = Owners.attachOwnersByJoin(files, dim).collect()
      .map(r => r.getAs[String]("path") -> Option(r.getAs[String]("owner_joined")))
      .toMap
    assert(udfMap == joinMap)
    // nearest-ancestor semantics hold at depth: deepest dim entry wins
    assert(udfMap(paths(42)).contains("pi_leafish"))
    assert(udfMap(paths(1)).contains("pi_g1p1"))
    // the bounded explode emitted ≤ (dim max '/'-count)+1 prefix rows
    // per path + root, not 50 — pin via the exploded row count
    val maxParts = Owners.maxSlashOf(dimPairs.map(_._1)) + 1
    val nPrefix = files.select(
        explode(graft.functions.Exprs.ancestorPrefixes(col("path"), maxParts)))
      .count()
    assert(nPrefix <= paths.length.toLong * (maxParts + 1),
      s"bounded explode leaked depth rows: $nPrefix")
  }
}
