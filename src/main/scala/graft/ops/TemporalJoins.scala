package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of and range joins — the temporal operators Spark's built-in join
  * strategies don't express directly (a naive inequality join plans as
  * BroadcastNestedLoop or a cartesian, both scale-killers).
  *
  * Both are composed from shuffle-friendly primitives so they survive a
  * 100 TB fact side:
  *
  *  - [[asofJoin]] is the union–window formulation: tag both sides,
  *    union on a common schema, one window pass per key ordered by
  *    time. ONE shuffle on the key, linear scan — never the
  *    events×orders-per-key candidate blowup of the rank-then-filter
  *    formulation.
  *  - [[pointInInterval]] is the bucketed interval join: intervals
  *    explode into the fixed-width buckets they cover, points map to
  *    exactly one bucket, and the range predicate becomes an EQUALITY
  *    join on the bucket id plus a residual filter. Shuffle volume is
  *    O(points + Σ interval-width/bucket), never O(points × intervals);
  *    hot buckets re-split by AQE skew-join.
  */
object TemporalJoins {

  /** Point-in-time (as-of) join: for each left row, attach the payload
    * of the LATEST right row with the same key and `rightTime` ≤
    * `leftTime`. Ties on `rightTime` resolve to the largest `tieBreak`
    * value, so the result is deterministic. Left rows with no prior
    * right row keep null payload (left-outer semantics).
    *
    * Payload columns are taken atomically from the winning right row
    * (they travel as one struct), and must be non-null there.
    *
    * `tolerance` bounds the lookback: a match older than `leftTime −
    * tolerance` is nulled out (the "as-of within t" variant every
    * feature store offers — stale state is worse than no state). Same
    * single-shuffle plan; the bound is a residual condition on the
    * winning row's own time, which rides along inside the payload
    * struct.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], tieBreak: String,
      prefix: String = "asof_",
      tolerance: Option[Column] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val pay = struct((payload :+ rightTime).distinct.map(col): _*)
    val payType = right.select(pay).schema.head.dataType
    val tieType = right.schema(tieBreak).dataType
    // common shape: key, time, side (right sorts before left at equal
    // time, so a right row AT the left time is visible), payload struct,
    // and the left columns (null on the right side)
    val l = left.select(Seq(
      col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side"),
      lit(null).cast(tieType).as("__tie"),
      lit(null).cast(payType).as("__p")) ++ leftCols.map(col): _*)
    val r = right.select(Seq(
      col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side"),
      col(tieBreak).as("__tie"), pay.as("__p")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("__best", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = tolerance match {
      case Some(t) => joined.withColumn("__best",
        when(col(s"__best.$rightTime") >= col("__t") - t, col("__best")))
      case None => joined
    }
    val out = leftCols.map(col) ++
      payload.map(p => col(s"__best.$p").as(s"$prefix$p"))
    bounded.select(out: _*)
  }

  /** Range (point-in-interval) join: inner-join `points` rows to every
    * `intervals` row with `lo` ≤ `point` < `hi`, where all three are
    * LONG columns on the same scale (e.g. epoch seconds). `bucket` is
    * the bin width: intervals spanning many buckets are exploded once
    * per covered bucket, so pick it near the typical interval length.
    * Each (point, interval) pair meets in exactly one bucket — no
    * post-join dedup needed.
    */
  def pointInInterval(points: DataFrame, point: String,
      intervals: DataFrame, lo: String, hi: String,
      bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    val iv = intervals.withColumn("__b",
      explode(sequence(floor(col(lo) / bucket).cast("long"),
        floor((col(hi) - 1) / bucket).cast("long"))))
    val pt = points.withColumn("__b", floor(col(point) / bucket).cast("long"))
    pt.join(iv, pt("__b") === iv("__b") &&
        col(point) >= col(lo) && col(point) < col(hi))
      .drop("__b")
  }
}
