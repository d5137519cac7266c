package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk ratio margin): the
  * planted-twin invariant the operator exists to deliver — a true
  * parallel pair (here: the identical vector re-entered on the other
  * side) mines at rank 1 for every query, with a margin strictly above
  * every non-twin candidate — plus the hubness property that motivates
  * the margin over raw cosine.
  */
class MarginMiningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  test("planted translation twins mine at rank 1 with the top margin") {
    val src = emb.filter($"vec_id" % 2 === 0).select($"vec_id", $"embedding")
    val queries = src.filter($"vec_id" < 16)
    val twins = queries.select(($"vec_id" + 100001L).as("vec_id"), $"embedding")
    val tgt = emb.filter($"vec_id" % 2 === 1)
      .select($"vec_id", $"embedding").unionAll(twins)
    val mined = Similarity.marginMining(src, tgt, queries,
      "embedding", "vec_id", k = 4, pool = 8, topPairs = 3)
      .collect()
    val byQuery = mined.groupBy(_.getLong(0))
    assert(byQuery.size == 8)
    byQuery.foreach { case (qid, rows) =>
      val top = rows.minBy(_.getLong(1))
      assert(top.getLong(2) == qid + 100001L,
        s"query $qid: rank-1 pair is ${top.getLong(2)}, not its twin")
      // the twin's margin strictly dominates every other mined pair
      val twinMargin = top.getDouble(3)
      rows.filter(_.getLong(1) > 1L).foreach { r =>
        assert(r.getDouble(3) < twinMargin,
          s"query $qid: non-twin ${r.getLong(2)} margin ${r.getDouble(3)} " +
            s">= twin margin $twinMargin")
      }
    }
  }

  test("marginMiningAnn: corpus-scale composition mines the twins at rank 1 and matches the exact tier at exhaustive ef") {
    val src = emb.filter($"vec_id" % 2 === 0).select($"vec_id", $"embedding")
      .filter($"vec_id" < 64) // the whole source side IS the query set
    val twins = src.select(($"vec_id" + 100001L).as("vec_id"), $"embedding")
    val tgt = emb.filter($"vec_id" % 2 === 1)
      .select($"vec_id", $"embedding").unionAll(twins)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mine-ann").toString
    // ef ≥ corpus: each shard search is effectively exhaustive, so the
    // ANN candidate sets equal the exact tier's and margins match
    // bit-for-bit
    val ann = Similarity.marginMiningAnn(src, tgt, "embedding", "vec_id",
      dir, k = 4, pool = 8, topPairs = 3, shards = 3, ef = 512)
    val annRows = ann.collect()
    val byQuery = annRows.groupBy(_.getLong(0))
    assert(byQuery.size == src.count())
    byQuery.foreach { case (qid, rows) =>
      val top = rows.minBy(_.getLong(1))
      assert(top.getLong(2) == qid + 100001L,
        s"query $qid: ANN rank-1 pair is ${top.getLong(2)}, not its twin")
    }
    // parity with the exact tier: same (query, rank, match) triples,
    // margins equal (same integer-micro operands found)
    val exact = Similarity.marginMining(src, tgt, src,
      "embedding", "vec_id", k = 4, pool = 8, topPairs = 3).collect()
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(annRows.map(key).toSet == exact.map(key).toSet,
      "exhaustive-ef ANN mining diverged from the exact tier's ranking")
    val exactMargins = exact.map(r => key(r) -> r.getDouble(3)).toMap
    annRows.foreach { r =>
      assert(r.getDouble(3) == exactMargins(key(r)),
        s"margin mismatch at ${key(r)}")
    }
    // plan hygiene: the probe stream joins graphs without broadcasting
    // a corpus and nothing degenerates to all-pairs
    val audit = graft.tools.PlanAudit.audit(ann)
    assert(audit.clean, audit.render)
    val fwdProbe = graft.ops.Hnsw.probeStreaming(
      src.select($"vec_id", $"embedding"), s"$dir/tgt", 3,
      "vec_id", "embedding", 8, ef = 512, excludeSelf = false)
    val probePlan = fwdProbe.queryExecution.executedPlan.toString()
    assert(!probePlan.contains("BroadcastExchange"),
      "the corpus-side query stream must reach the shard probes " +
        "without a broadcast:\n" + probePlan)
  }

  test("margin normalizes cosine inflation: identical pairs score ~2/(1+meanK), never a fixed 1.0") {
    // two queries in different hubness regimes get DIFFERENT raw
    // twin cosine... both exactly 1, but different margins — the
    // per-item kNN mean is doing the normalizing work
    val src = emb.filter($"vec_id" % 2 === 0).select($"vec_id", $"embedding")
    val queries = src.filter($"vec_id" < 16)
    val twins = queries.select(($"vec_id" + 100001L).as("vec_id"), $"embedding")
    val tgt = emb.filter($"vec_id" % 2 === 1)
      .select($"vec_id", $"embedding").unionAll(twins)
    val top1 = Similarity.marginMining(src, tgt, queries,
      "embedding", "vec_id", k = 4, pool = 8, topPairs = 1)
      .select($"margin").collect().map(_.getDouble(0))
    // all twins have cosine 1, yet margins differ per query's local
    // cosine landscape and all exceed 1 (a twin always beats the mean
    // of its neighborhood)
    assert(top1.forall(_ > 1.0))
    assert(top1.distinct.length > 1,
      "margins identical across queries — the kNN normalizer is inert")
  }
}
