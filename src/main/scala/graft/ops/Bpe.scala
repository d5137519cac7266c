package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE merge-table learning (Sennrich et al. 2016 — public
  * literature): iteratively merge the most frequent adjacent symbol
  * pair across the corpus, `nMerges` times.
  *
  * Scale posture: the heavy part — word counting over the corpus — is
  * ONE distributed explode→groupBy with map-side partials; the merge
  * loop then runs on the driver over the BOUNDED top-`maxWords`
  * word-frequency model (the same bounded-model-state pattern as IVF
  * centroid training: standard BPE trainers operate on the word-freq
  * dictionary, and capping it to the heavy hitters is what production
  * tokenizer pipelines do — tail words contribute ~nothing to pair
  * counts). Nothing row-scale ever reaches the driver.
  */
object Bpe {

  /** Learn up to `nMerges` merges from `textCol`, most frequent pair
    * first. Ties break lexicographically (deterministic across runs,
    * partitionings and engines). Stops early when no pair repeats.
    */
  def learn(df: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 50000): Seq[(String, String)] = {
    val wordFreq: Array[(Array[String], Long)] = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords) // bounded model state for the driver loop
      .collect()
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))

    var vocab = wordFreq
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      val candidates = counts.filter(_._2 > 1)
      if (candidates.isEmpty) exhausted = true
      else {
        val best = candidates.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (syms, n) => (mergePair(syms, best), n) }
        k += 1
      }
    }
    merges.toSeq
  }

  /** Merge every left-to-right non-overlapping occurrence of `pair` —
    * the same application order [[graft.functions.BpeEncode]] uses.
    */
  private[graft] def mergePair(syms: Array[String],
      pair: (String, String)): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += pair._1 + pair._2
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.toArray
  }
}
