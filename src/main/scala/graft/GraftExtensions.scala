package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DecimalDotExpr, FindExtensionExpr, FloatDotExpr}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions so SQL users get them as builtins, and the custom
  * planner strategy ([[graft.plans.GraftStrategy]]) so custom logical
  * operators ([[graft.plans.RangeJoin]]) plan into their physical
  * forms.
  *
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)        // programmatic
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  *
  * After registration: `SELECT find_extension(path) FROM files` runs the
  * codegen'd [[FindExtensionExpr]] — no UDF registration per session,
  * no boxing, visible in EXPLAIN like any builtin. Sessions built
  * elsewhere get the same surface via [[graft.plans.Graft.install]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    GraftExtensions.functionDescriptors.foreach(ext.injectFunction)
  }
}

object GraftExtensions {

  /** All native SQL function descriptors, in `injectFunction` shape. */
  def functionDescriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(findExtensionDescriptor, decimalDotDescriptor, floatDotDescriptor,
      zOrderDescriptor, topKDescriptor, freqItemsDescriptor,
      bloomAggDescriptor, bloomContainsDescriptor, cmsAggDescriptor,
      lcpDescriptor, md5Long60Descriptor) ++ kllDescriptors

  val md5Long60Descriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_md5_long60"),
    new ExpressionInfo(
      classOf[graft.functions.Md5Long60Expr].getCanonicalName, null,
      "graft_md5_long60",
      "graft_md5_long60(c) - first 60 bits of md5(c) as BIGINT, computed " +
        "from the digest bytes; value-identical to " +
        "conv(substring(md5(c),1,15),16,10) without the hex round-trip", ""),
    (children: Seq[Expression]) => {
      require(children.length == 1, "graft_md5_long60 takes exactly 1 argument")
      graft.functions.Md5Long60Expr(children.head)
    })

  val lcpDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("lcp"),
    new ExpressionInfo(
      classOf[graft.functions.LcpExpr].getCanonicalName, null,
      "lcp",
      "lcp(a, b, cap) - longest common prefix of two strings in UTF-16 " +
        "code units, clamped to the INT-literal cap (code-generated " +
        "char loop; the HOF aggregate/sequence spelling is " +
        "CodegenFallback and ~35x slower, PERF.md r9s5)", ""),
    (children: Seq[Expression]) => {
      require(children.length == 3, "lcp takes exactly 3 arguments")
      val cap = children(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"lcp cap must be an INT literal, got $other")
      }
      graft.functions.LcpExpr(children.head, children(1), cap)
    })

  val cmsAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cms_agg"),
    new ExpressionInfo(
      classOf[graft.functions.CmsLongsAgg].getCanonicalName, null,
      "cms_agg",
      "cms_agg(hash64, depth) - mergeable Count-Min sketch over pre-hashed " +
        "BIGINT inputs (depth x 64 counters as flat ARRAY<BIGINT>; " +
        "overestimates only)", ""),
    (children: Seq[Expression]) => {
      require(children.length == 2, "cms_agg takes exactly 2 arguments")
      graft.functions.CmsLongsAgg(children(0), children(1))
    })

  val bloomAggDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_agg"),
    new ExpressionInfo(
      classOf[graft.functions.BloomLongsAgg].getCanonicalName, null,
      "bloom_agg",
      "bloom_agg(hash64, numBits, numHashes) - mergeable Bloom filter over " +
        "pre-hashed BIGINT inputs (BINARY result; zero false negatives)", ""),
    (children: Seq[Expression]) => {
      require(children.length == 3, "bloom_agg takes exactly 3 arguments")
      graft.functions.BloomLongsAgg(children(0), children(1), children(2))
    })

  val bloomContainsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_contains"),
    new ExpressionInfo(
      classOf[graft.functions.BloomContainsExpr].getCanonicalName, null,
      "bloom_contains",
      "bloom_contains(filter, hash64, numHashes) - codegen'd membership probe " +
        "against a bloom_agg filter", ""),
    (children: Seq[Expression]) => {
      require(children.length == 3, "bloom_contains takes exactly 3 arguments")
      graft.functions.BloomContainsExpr(children(0), children(1), children(2))
    })

  val kllDescriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("kll_sketch_bytes"),
      new ExpressionInfo(
        classOf[graft.functions.KllSketchAgg].getCanonicalName, null,
        "kll_sketch_bytes",
        "kll_sketch_bytes(value) - mergeable KLL quantile sketch over DOUBLEs " +
          "(serialized bytes; ~3 KB per group)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 1, "kll_sketch_bytes takes exactly 1 argument")
        graft.functions.KllSketchAgg(children.head)
      }),
    (FunctionIdentifier("kll_merge_bytes"),
      new ExpressionInfo(
        classOf[graft.functions.KllMergeAgg].getCanonicalName, null,
        "kll_merge_bytes",
        "kll_merge_bytes(sketch) - union serialized KLL sketches without rescanning data", ""),
      (children: Seq[Expression]) => {
        require(children.length == 1, "kll_merge_bytes takes exactly 1 argument")
        graft.functions.KllMergeAgg(children.head)
      }),
    (FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(
        classOf[graft.functions.KllQuantileExpr].getCanonicalName, null,
        "kll_quantile",
        "kll_quantile(sketch, rank) - quantile estimate from a KLL sketch value " +
          "(inclusive rank semantics)", ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "kll_quantile takes exactly 2 arguments")
        graft.functions.KllQuantileExpr(children.head, children(1))
      }))

  val freqItemsDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("freq_items"),
    new ExpressionInfo(
      classOf[graft.functions.FreqItemsAgg].getCanonicalName,
      null,
      "freq_items",
      "freq_items(value, maxMapSize) - mergeable heavy-hitters sketch " +
        "(DataSketches frequent-items): bounded counter map per group, " +
        "array<struct<item,estimate,lb,ub>> under NO_FALSE_POSITIVES",
      ""),
    (children: Seq[Expression]) => {
      require(children.length == 2, "freq_items takes exactly 2 arguments")
      graft.functions.FreqItemsAgg(children.head, children(1))
    })

  val topKDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("top_k"),
    new ExpressionInfo(
      classOf[graft.functions.TopKLongsAgg].getCanonicalName,
      null,
      "top_k",
      "top_k(value, k) - the k largest BIGINT values of the group, " +
        "sorted descending (bounded-heap aggregate: the shuffle carries " +
        "at most k values per partition per group)",
      ""),
    (children: Seq[Expression]) => {
      require(children.length == 2, "top_k takes exactly 2 arguments")
      graft.functions.TopKLongsAgg(children.head, children(1))
    })

  val zOrderDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("z_order"),
    new ExpressionInfo(
      classOf[graft.functions.ZOrderExpr].getCanonicalName,
      null,
      "z_order",
      "z_order(a, b) - Morton interleave of two BIGINT rank keys " +
        "(codegen) for multi-dimension write clustering",
      ""),
    (children: Seq[Expression]) => {
      require(children.length == 2, "z_order takes exactly 2 arguments")
      graft.functions.ZOrderExpr(children.head, children(1))
    })
  val findExtensionDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("find_extension"),
    new ExpressionInfo(
      classOf[FindExtensionExpr].getCanonicalName,
      null,
      "find_extension",
      "find_extension(path) - extension per storage-crawler semantics " +
        "(tail-window-then-wrap scan, storcrawl.py:259-268)",
      ""),
    (children: Seq[Expression]) => {
      require(children.length == 1, "find_extension takes exactly 1 argument")
      FindExtensionExpr(children.head)
    })

  val decimalDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("decimal_dot"),
    new ExpressionInfo(
      classOf[DecimalDotExpr].getCanonicalName,
      null,
      "decimal_dot",
      "decimal_dot(a, b) - exact DECIMAL(38,16) dot product of two " +
        "ARRAY<DECIMAL(12,8)> vectors (codegen, unscaled-long arithmetic)",
      ""),
    (children: Seq[Expression]) => {
      require(children.length == 2, "decimal_dot takes exactly 2 arguments")
      DecimalDotExpr(children.head, children(1))
    })

  val floatDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("float_dot"),
    new ExpressionInfo(
      classOf[FloatDotExpr].getCanonicalName,
      null,
      "float_dot",
      "float_dot(a, b) - dot product of two ARRAY<FLOAT> vectors " +
        "(codegen; float multiply, double accumulate)",
      ""),
    (children: Seq[Expression]) => {
      require(children.length == 2, "float_dot takes exactly 2 arguments")
      FloatDotExpr(children.head, children(1))
    })
}
