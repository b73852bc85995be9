package graft.crawl

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exprs

/** S3/F9/J1 — the owners dimension (storcrawl.py:219-256).
  *
  * File format, one mapping per line: `pi=/dir1:/dir2` (split on the
  * FIRST '=' — divergence A6: the reference crashes on lines with two,
  * we take split_part semantics). Skip-list entries and first-wins on
  * duplicate dirs (storcrawl.py:236-241, A5) are preserved via a
  * line-number window, not nondeterministic dropDuplicates.
  *
  * Lookup (find_owner, storcrawl.py:245-256): exact path first, then
  * dirname ancestors, nearest wins. Two interchangeable plans:
  *  - [[findOwnerUdf]]: broadcast Map + O(depth) walk per row — the
  *    reference's replicated-dict design; right when the dim fits in
  *    memory (it is a human-maintained file; it always does).
  *  - [[attachOwnersByJoin]]: prefix-explode + broadcast equi-join +
  *    deepest-match window — pure Catalyst, oracle-expressible, and the
  *    fallback if a dimension ever outgrew broadcast (the explode side
  *    scales with path depth, not dim size).
  */
object Owners {

  /** Reference SKIP_LIST (storcrawl.py:223). */
  val SkipList: Set[String] = Set("Nothing", "netapp->thorium-a.fhcrc.org")

  /** Parse an owners file into a (pi, dir) dimension DataFrame. */
  def load(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.textFile(path).toDF("value")
      .withColumn("line_no", monotonically_increasing_id())
      .filter(length(trim(col("value"))) > 0)
    val exploded = lines.select(
        expr("split_part(value, '=', 1)").as("pi"),
        col("line_no"),
        explode(split(expr("split_part(value, '=', 2)"), ":")).as("dir"))
      .filter(!col("dir").isInCollection(SkipList) && length(col("dir")) > 0)
    // first-wins on duplicate dirs (A5): earliest line keeps the mapping
    val w = Window.partitionBy("dir").orderBy("line_no")
    exploded
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("pi", "dir")
  }

  /** Broadcast dict + ancestor walk — the faithful find_owner. Guard
    * divergence A7: relative paths stop at "" instead of recursing
    * forever.
    *
    * `maxSlashBound` bounds the walk by the DIMENSION's depth: a
    * prefix containing more '/' than the deepest dim key can never be
    * a key of `owners`, so the walk jumps straight to the deepest
    * possibly-matching prefix (one forward char scan) instead of
    * re-substringing its way down from a 50-level leaf. Cost becomes
    * O(dim depth) lookups per path — tree depth drops out entirely —
    * and results are provably unchanged (every skipped prefix is a
    * guaranteed miss; OwnersPropertySpec pins bounded ≡ unbounded). */
  def findOwner(owners: Map[String, String], maxSlashBound: Int = Int.MaxValue)(
      path: String): Option[String] = {
    @annotation.tailrec
    def walk(p: String): Option[String] =
      owners.get(p) match {
        case some @ Some(_)              => some
        case None if p == "/" || p == "" => None
        case None =>
          val idx = p.lastIndexOf('/')
          walk(if (idx <= 0) (if (p.startsWith("/")) "/" else "") else p.substring(0, idx))
      }
    val start =
      if (maxSlashBound == Int.MaxValue) path
      else {
        // cut before the (maxSlashBound+1)-th '/': the deepest prefix
        // with ≤ maxSlashBound separators (raw char count, so the
        // bound is sound even for '//' paths)
        var slashes = 0; var i = 0; var cut = -1
        while (i < path.length && cut < 0) {
          if (path.charAt(i) == '/') {
            slashes += 1
            if (slashes > maxSlashBound) cut = i
          }
          i += 1
        }
        if (cut < 0) path
        else if (cut == 0) (if (path.startsWith("/")) "/" else "")
        else path.substring(0, cut)
      }
    walk(start)
  }

  /** Largest '/'-count over the dim's keys — the useful-prefix depth
    * bound shared by both J1 plans. */
  def maxSlashOf(dirs: Iterable[String]): Int =
    if (dirs.isEmpty) 0 else dirs.iterator.map(_.count(_ == '/')).max

  def findOwnerUdf(spark: SparkSession, dim: DataFrame): Column = {
    val m: Map[String, String] = dim
      .select("dir", "pi").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val bound = maxSlashOf(m.keys)
    val bc: Broadcast[Map[String, String]] = spark.sparkContext.broadcast(m)
    udf((p: String) => findOwner(bc.value, bound)(p)).apply(col("path"))
  }

  /** The pure-Catalyst plan: explode ancestor prefixes (incl. self),
    * broadcast-join the dim, keep the deepest match per path. The
    * explode is bounded by the dim's depth too — a k-part prefix has
    * k-1 separators, so parts beyond (max dim '/'-count)+1 are
    * guaranteed join misses and are never emitted: on a 50-level tree
    * with a 3-level owners file the explode emits 4 rows per path,
    * not 50. */
  def attachOwnersByJoin(files: DataFrame, dim: DataFrame): DataFrame = {
    val maxParts = maxSlashOf(
      dim.select("dir").collect().map(_.getString(0))) + 1
    val exploded = files.select(col("path"),
        explode(Exprs.ancestorPrefixes(col("path"), maxParts)).as("a"))
      .select(col("path"), col("a.prefix").as("prefix"), col("a.depth").as("depth"))
    // deepest match via max_by: map-side partial agg, no window sort
    val matched = exploded
      .join(broadcast(dim), col("prefix") === col("dir"))
      .groupBy("path")
      .agg(max_by(col("pi"), col("depth")).as("owner_joined"))
    files.join(matched, Seq("path"), "left")
  }
}
