package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank over an edge list — the graph-centrality pass a web-scale
  * corpus pipeline runs to weight crawl domains (harmonic/PageRank
  * centrality is a standard crawl-quality prior; the algorithm is
  * Brin & Page 1998, public literature).
  *
  * Fixed-point INTEGER arithmetic throughout: ranks live in units of
  * 1e-12 (`Scale`), every division is integer division, and each
  * iteration's inflow is an integer sum — so the result is
  * order-independent and bit-identical across engines and partition
  * counts (a double-valued PageRank drifts with partial-agg order and
  * can never hash-match an oracle).
  *
  * Semantics: pr⁰(v) = Scale/N; prⁱ(v) = (Scale·15/100)/N +
  * (Σ_{u→v} prⁱ⁻¹(u) div outdeg(u))·85 div 100. Dangling-node mass
  * (and integer-division remainders) dissipate — total mass is not
  * conserved, which is fine for ranking (relative order is what the
  * downstream weighting consumes).
  *
  * Scale posture: one groupBy(dst) shuffle per iteration over the
  * edge list; the static edge⋈outdeg side is computed once and
  * persisted; rank tables are localCheckpoint'd each round so the
  * plan stays O(1) deep (the Components.scala lesson). No driver-side
  * graph — the only driver value is N (one scalar).
  */
object PageRank {

  val Scale: Long = 1000000000000L // 1e12 fixed-point units

  /** Ranks for every node of `edges` after `iters` iterations:
    * (node, pr) with pr in Scale units.
    *
    * @param edges DataFrame with `src` and `dst` columns (directed)
    */
  def run(edges: DataFrame, iters: Int,
      broadcastRanksMax: Long = 4L << 20): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count() // bounded model state: one scalar
    require(n > 0, "PageRank needs a non-empty graph")
    // rank/inflow tables carry exactly ≤ n rows every iteration — n is
    // already counted exactly, so while it fits the cap both per-round
    // joins broadcast the node-scale side and the persisted edge table
    // never shuffles (without the hint the checkpointed rank table has
    // no stats and every iteration pays sort-merge exchanges over the
    // edge list). Past the cap: shuffled joins, the 100 TB shape.
    val bcastRanks = n <= broadcastRanksMax
    val outdeg = e.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    // static per-edge side: (dst, src, outdeg) — computed once, cached
    // at first use (iteration 1), reused by every later round
    val eo = e.join(outdeg, Seq("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val base = Scale * 15 / 100 / n
    // Unlike Components (whose round references the previous round's
    // table SEVERAL times, growing the plan 3^rounds without
    // truncation), each PageRank round references `pr` exactly ONCE —
    // the plan grows LINEARLY in `iters`. So lineage only needs
    // truncating every few rounds, and the whole chain between
    // checkpoints materializes in ONE job instead of one eager
    // checkpoint job per round (the per-round jobs were pure overhead
    // at bench scale; at cluster scale fewer barriers also lets AQE
    // pipeline the per-round stages). Integer arithmetic makes the
    // result bit-identical regardless of checkpoint placement.
    var pr = nodes.withColumn("pr", lit(Scale / n))
    for (i <- 1 to iters) {
      val prSrc = pr.withColumnRenamed("node", "src")
      val inflow = eo
        .join(if (bcastRanks) broadcast(prSrc) else prSrc, Seq("src"))
        .select(col("dst").as("node"),
          expr("pr div outdeg").as("contrib"))
        .groupBy(col("node"))
        .agg(sum(col("contrib")).as("inflow"))
      pr = nodes.join(if (bcastRanks) broadcast(inflow) else inflow,
          Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("coalesce(inflow, 0L) * 85 div 100"))
            .as("pr"))
      if (i % 4 == 0 && i < iters) pr = pr.localCheckpoint(true)
    }
    // materialize the final ranks BEFORE dropping the caches the plan
    // reads — callers receive a truncated, cache-independent table
    pr = pr.localCheckpoint(true)
    e.unpersist(false)
    eo.unpersist(false)
    nodes.unpersist(false)
    pr
  }
}
