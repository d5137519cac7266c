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

  test("incremental re-mining: load → append (touched shards only) → save → mine with reused indexes finds the new twins") {
    val src = emb.filter($"vec_id" % 2 === 0).select($"vec_id", $"embedding")
      .filter($"vec_id" < 64)
    val twins = src.filter($"vec_id" < 16)
      .select(($"vec_id" + 100001L).as("vec_id"), $"embedding")
    val tgt0 = emb.filter($"vec_id" % 2 === 1)
      .select($"vec_id", $"embedding").unionAll(twins)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-mine-inc").toString
    // first mining pass builds and persists both side channels
    Similarity.marginMiningAnn(src, tgt0, "embedding", "vec_id", dir,
      k = 4, pool = 8, topPairs = 1, shards = 3, ef = 512).collect()
    // a NEW batch of target twins arrives (for queries 16..31): append
    // into the persisted target index without rebuilding it
    val newTwins = src.filter($"vec_id" >= 16 && $"vec_id" < 32)
      .select(($"vec_id" + 100001L).as("vec_id"), $"embedding")
    val loaded = graft.ops.Hnsw.loadShardedIndex(spark, s"$dir/tgt")
    assert(loaded.count() == 3, "side-channel round trip lost shards")
    graft.ops.Hnsw.saveShardedIndex(
      graft.ops.Hnsw.appendToShardedIndex(loaded, newTwins,
        "vec_id", "embedding", shards = 3), s"$dir/tgt")
    // re-mine REUSING the refreshed indexes (no rebuild): every query
    // that now has a twin mines it at rank 1
    val tgt1 = tgt0.unionAll(newTwins)
    val mined = Similarity.marginMiningAnn(src, tgt1, "embedding",
      "vec_id", dir, k = 4, pool = 8, topPairs = 1, shards = 3,
      ef = 512, reuseIndexes = true).collect()
    val top = mined.map(r => r.getLong(0) -> r.getLong(2)).toMap
    (0L until 32L by 2L).foreach { qid =>
      assert(top.get(qid).contains(qid + 100001L),
        s"query $qid: twin not mined at rank 1 after the incremental append")
    }
    // a STALE format marker (an index dir left by a build with a
    // different graph codec) gates reuse: the call rebuilds instead
    // of deserializing garbage, and republishes a fresh layout
    def curSub(root: String): java.io.File = {
      val ptr = new java.io.File(root, "_graft_hnsw_current")
      new java.io.File(root, new String(
        java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim)
    }
    val marker = new java.io.File(curSub(s"$dir/tgt"), "_graft_hnsw_format")
    java.nio.file.Files.writeString(marker.toPath, "0")
    // the raw write bypassed Hadoop's checksum sidecar — drop it so
    // the LocalFS read sees the tampered content, not a crc error
    new java.io.File(curSub(s"$dir/tgt"), "._graft_hnsw_format.crc").delete()
    val remined = Similarity.marginMiningAnn(src, tgt1, "embedding",
      "vec_id", dir, k = 4, pool = 8, topPairs = 1, shards = 3,
      ef = 512, reuseIndexes = true).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(remined(0L) == 100001L, "stale-format rebuild lost the twins")
    val restamped = new java.io.File(curSub(s"$dir/tgt"), "_graft_hnsw_format")
    assert(java.nio.file.Files.readAllLines(restamped.toPath)
      .get(0).trim == "2",
      "the rebuild did not republish a current-format layout")
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
