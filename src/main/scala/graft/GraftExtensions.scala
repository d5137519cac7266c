package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `spark.sql.extensions=graft.GraftExtensions` injects the engine's
  * custom planner strategies and SQL functions into any session at
  * build time; the programmatic path (`graft.plans.TopK.register`,
  * `GraftExtensions.registerFunctions`) does the same on a live
  * session.
  *
  * SQL surface: `graft_minhash(hashes)`, `graft_simhash(hashes)`,
  * `graft_ngram_hashes(tokens, n)`, `graft_cosine(a, b)`,
  * `graft_freq_items(item, k)` and `graft_quantiles(value, p, cap)`
  * (aggregates).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    // catalog reads resolve to the DeltaLite skipping-index scan
    e.injectResolutionRule(_ =>
      org.apache.spark.sql.graftbridge.GraftCatalogReads)
    // SQL UPDATE / MERGE INTO route to the table API (post-hoc: the
    // command must be fully resolved before conversion)
    e.injectPostHocResolutionRule(_ =>
      org.apache.spark.sql.graftbridge.GraftDml)
    // Delta-verbatim maintenance SQL (OPTIMIZE / VACUUM / DESCRIBE
    // HISTORY / RESTORE) translates to the CALL procedures
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
    functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {
  import graft.functions._

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_minhash",
      info("graft_minhash", "graft_minhash(hashes) - 64-perm MinHash signature"),
      (args: Seq[Expression]) => MinHashSignature(args.head, 64, 7L)),
    ("graft_simhash",
      info("graft_simhash", "graft_simhash(hashes) - 64-bit SimHash"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    ("graft_ngram_hashes",
      info("graft_ngram_hashes", "graft_ngram_hashes(tokens, n) - distinct hashed word n-grams"),
      (args: Seq[Expression]) => NgramHashes(args.head,
        args(1).eval().asInstanceOf[Int], mod31 = false)),
    ("graft_cosine",
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two vectors"),
      (args: Seq[Expression]) => CosineSimilarity(args.head, args(1))),
    ("graft_jaro_winkler",
      info("graft_jaro_winkler",
        "graft_jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]"),
      (args: Seq[Expression]) => JaroWinkler(args.head, args(1))),
    ("graft_freq_items",
      info("graft_freq_items",
        "graft_freq_items(item, k) - Misra-Gries top-items sketch aggregate"),
      (args: Seq[Expression]) => FreqItemsSketch(args.head,
        args(1).eval().asInstanceOf[Int]).toAggregateExpression()),
    ("graft_quantiles",
      info("graft_quantiles",
        "graft_quantiles(value, p, capacity) - mergeable quantile-sketch aggregate (exact under capacity)"),
      (args: Seq[Expression]) => {
        // SQL numeric literals arrive as Decimal, not java.lang.Number
        def toD(a: Any): Double = a match {
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case n: Number => n.doubleValue()
        }
        QuantileSketch(args.head, Seq(toD(args(1).eval())),
          toD(args(2).eval()).toInt).toAggregateExpression()
      }),
    ("graft_distinct",
      info("graft_distinct",
        "graft_distinct(item, threshold) - mergeable distinct-count sketch (exact below threshold, HLL beyond)"),
      (args: Seq[Expression]) => DistinctSketch(args.head,
        exactThreshold = args(1).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()),
    ("graft_distinct_state",
      info("graft_distinct_state",
        "graft_distinct_state(item, threshold) - distinct sketch evaluating to its serialized state (re-aggregatable)"),
      (args: Seq[Expression]) => DistinctSketchState(args.head,
        exactThreshold = args(1).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()),
    ("graft_distinct_merge",
      info("graft_distinct_merge",
        "graft_distinct_merge(state, threshold) - merge serialized sketch states into a distinct estimate"),
      (args: Seq[Expression]) => DistinctSketchMerge(args.head,
        exactThreshold = args(1).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()),
    ("graft_cms",
      info("graft_cms",
        "graft_cms(item, depth, width) - count-min frequency sketch aggregate"),
      (args: Seq[Expression]) => CountMinAgg(args.head,
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression()),
    ("graft_cms_est",
      info("graft_cms_est",
        "graft_cms_est(sketch, item, depth, width) - count-min point estimate"),
      (args: Seq[Expression]) => CmsEstimate(args.head, args(1),
        args(2).eval().asInstanceOf[Number].intValue(),
        args(3).eval().asInstanceOf[Number].intValue())))

  /** Register the SQL functions on a live session (idempotent). */
  def registerFunctions(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
