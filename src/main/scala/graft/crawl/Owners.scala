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
    * forever. */
  def findOwner(owners: Map[String, String])(path: String): Option[String] = {
    @annotation.tailrec
    def walk(p: String): Option[String] =
      owners.get(p) match {
        case some @ Some(_)              => some
        case None if p == "/" || p == "" => None
        case None =>
          val idx = p.lastIndexOf('/')
          walk(if (idx <= 0) (if (p.startsWith("/")) "/" else "") else p.substring(0, idx))
      }
    walk(path)
  }

  def findOwnerUdf(spark: SparkSession, dim: DataFrame): Column = {
    val m: Map[String, String] = dim
      .select("dir", "pi").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val bc: Broadcast[Map[String, String]] = spark.sparkContext.broadcast(m)
    udf((p: String) => findOwner(bc.value)(p)).apply(col("path"))
  }

  /** The pure-Catalyst plan: explode ancestor prefixes (incl. self),
    * broadcast-join the dim, keep the deepest match per path. */
  def attachOwnersByJoin(files: DataFrame, dim: DataFrame): DataFrame = {
    val exploded = files.select(col("path"),
        explode(Exprs.ancestorPrefixes(col("path"))).as("a"))
      .select(col("path"), col("a.prefix").as("prefix"), col("a.depth").as("depth"))
    // deepest match via max_by: map-side partial agg, no window sort
    val matched = exploded
      .join(broadcast(dim), col("prefix") === col("dir"))
      .groupBy("path")
      .agg(max_by(col("pi"), col("depth")).as("owner_joined"))
    files.join(matched, Seq("path"), "left")
  }
}
