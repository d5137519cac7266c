package graft

import graft.ops.RunningSum
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level running sum: identical to the single-partition window
  * cumsum, but each key's rows spread across shards (the 100 TB
  * posture fix for packSequences / domainMix / pretrainPack).
  */
class RunningSumSpec extends SparkSpec {

  test("twoLevel ≡ naive per-key window cumsum (skewed keys, many shards)") {
    import spark.implicits._
    // heavy skew: one key holds 90% of the rows — the shape that
    // serializes the naive window through a single task
    val rows = (1L to 5000L).map { i =>
      val k = if (i % 10 == 0) s"k${i % 3}" else "hot"
      (k, i, (i % 97) + 1) // value > 0, unique order col per key
    }
    val df = rows.toDF("key", "ord", "v")
    val naive = df.withColumn("cum",
      sum($"v").over(Window.partitionBy($"key").orderBy($"ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val two = RunningSum.twoLevel(df, Seq("key"), Seq($"ord"), $"v", "cum",
      shards = 16)
    assert(two.select("key", "ord", "v", "cum").except(
        naive.select("key", "ord", "v", "cum")).isEmpty,
      "two-level cumsum must equal the naive window")
    assert(naive.select("key", "ord", "v", "cum").except(
        two.select("key", "ord", "v", "cum")).isEmpty)
  }

  test("a hot key's rows occupy many shards (the parallelism claim)") {
    import spark.implicits._
    val df = (1L to 4000L).map(i => ("hot", i, 1L)).toDF("key", "ord", "v")
    val shardsUsed = RunningSum.twoLevel(df, Seq("key"), Seq($"ord"), $"v",
        "cum", shards = 16, keepShard = true)
      .select($"__rs_shard").distinct().count()
    assert(shardsUsed >= 8,
      s"hot key must pack across shards, not one task (got $shardsUsed)")
  }

  test("twoLevelMulti: both cumsums equal the naive windows from ONE range exchange") {
    import spark.implicits._
    val df = (1L to 3000L).map(i => (s"k${i % 3}", i, i % 7 + 1, i % 5))
      .toDF("key", "ord", "a", "b")
    val w = Window.partitionBy($"key").orderBy($"ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df.withColumn("ca", sum($"a").over(w))
      .withColumn("cb", sum($"b").over(w))
    val multi = RunningSum.twoLevelMulti(df, Seq("key"), Seq($"ord"),
      Seq($"a" -> "ca", $"b" -> "cb"), shards = 16)
    assert(multi.select("key", "ord", "ca", "cb").except(
      naive.select("key", "ord", "ca", "cb")).isEmpty)
    assert(naive.select("key", "ord", "ca", "cb").except(
      multi.select("key", "ord", "ca", "cb")).isEmpty)
    // the fusion claim: ONE range shuffle is actually WRITTEN for both
    // cumsums — the second textual occurrence in the static plan must
    // resolve to a ReusedExchange at runtime (AQE exchange reuse).
    // Two separate twoLevel passes would write two.
    multi.collect()
    val finalPlan = multi.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val written = finalPlan.linesIterator
      .filter(_.contains("Exchange rangepartitioning"))
      .filterNot(_.contains("ReusedExchange")).size
    val reused = finalPlan.linesIterator
      .filter(_.contains("ReusedExchange"))
      .count(_.contains("rangepartitioning"))
    assert(written == 1,
      s"fused pass must WRITE one range shuffle, saw $written:\n" +
        finalPlan.take(3000))
    assert(reused == 1,
      "the second consumer must ride AQE exchange reuse, not re-shuffle")
  }

  test("expression order columns (md5 order, the domainMix shape)") {
    import spark.implicits._
    val df = (1L to 800L).map(i => (s"s${i % 2}", i, i % 7 + 1)).toDF("key", "id", "v")
    val ord = Seq(md5($"id".cast("string")), $"id")
    val naive = df.withColumn("cum",
      sum($"v").over(Window.partitionBy($"key").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val two = RunningSum.twoLevel(df, Seq("key"), ord, $"v", "cum", shards = 8)
    assert(two.select("key", "id", "cum").except(
      naive.select("key", "id", "cum")).isEmpty)
    assert(naive.select("key", "id", "cum").except(
      two.select("key", "id", "cum")).isEmpty)
  }
}
