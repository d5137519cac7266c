package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a pair list — the transitive-closure step
  * of near-dedup: LSH/verify emits PAIRS (a≈b, b≈c), but survivor
  * selection needs CLUSTERS ({a,b,c} → keep min id), or chained
  * duplicates each keep a copy.
  *
  * Algorithm: iterative min-label propagation (the "large-star" half of
  * the MapReduce CC algorithm of Kiveris et al., "Connected Components
  * in MapReduce and Beyond" — public literature). Each round every
  * vertex adopts the smallest label in its neighborhood (including its
  * own); converges in O(diameter) rounds, and near-dup clusters have
  * tiny diameters (they're quasi-cliques from bucket joins).
  *
  * Scale posture: each round is one groupBy(vertex) → min(label)
  * shuffle of the edge list — no driver-side graph, no all-pairs. The
  * convergence check is a count of changed labels (an aggregate, not a
  * collect of data rows). Label tables persist between rounds and are
  * released on convergence; `maxRounds` bounds the worst case (a path
  * graph), which dedup workloads don't produce.
  */
object Components {

  /** Cluster assignment for every vertex appearing in `pairs`:
    * (vertex, component) where component = min vertex id reachable.
    *
    * @param pairs two-column DataFrame of undirected edges
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxRounds: Int = 20,
      broadcastLabelsMax: Long = 4L << 20): DataFrame = {
    // no distinct: min() tolerates duplicate edges, and the dedup
    // shuffle would cost more than the duplicates do. Partitioned by
    // `dst` BEFORE the persist: every round's propagation join keys on
    // dst, and the cached partitioning satisfies the join's required
    // distribution — one exchange of the edge list at build time
    // instead of one per round (guide §2.4; matters on the shuffled
    // fallback path below — the broadcast path never shuffles edges).
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Labels start as self. Each round MUST truncate lineage (lazy
    // localCheckpoint materialized by the convergence count): the
    // round's plan references the previous round's several times, so
    // without truncation the logical plan grows ~3^rounds and analysis
    // alone kills the driver — the standard iterative-DataFrame
    // failure mode (GraphX/GraphFrames checkpoint for the same
    // reason). Blocks are freed by the context cleaner when the
    // previous round's DF goes out of scope.
    var labels = edges.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint(true)
    // exact vertex count, once (the label table's cardinality is
    // CONSTANT across rounds): while it fits the cap, both per-round
    // label joins broadcast — the checkpointed label table has no
    // stats, so without the hint every round pays two sort-merge
    // joins' worth of exchanges against a table whose size is known.
    // Past the cap the rounds fall back to shuffled joins over the
    // pre-partitioned edge cache, the correct 100 TB shape.
    val nVertices = labels.count()
    val bcastLabels = nVertices <= broadcastLabelsMax

    // one min-label propagation step: (v, label) → (v, next_label,
    // changed) — the changed flag rides inside the output so
    // convergence is a filter-count on the checkpointed table, not an
    // extra join
    def step(lbl: DataFrame): DataFrame = {
      val lblDst = lbl.withColumnRenamed("v", "dst")
        .withColumnRenamed("label", "dst_label")
      val nbrMin = edges
        .join(if (bcastLabels) broadcast(lblDst) else lblDst, Seq("dst"))
        .groupBy(col("src").as("v"))
        .agg(min(col("dst_label")).as("nbr_label"))
      lbl.join(if (bcastLabels) broadcast(nbrMin) else nbrMin,
          Seq("v"), "left")
        .select(col("v"),
          least(col("label"), coalesce(col("nbr_label"), col("label")))
            .as("next_label"),
          (coalesce(col("nbr_label"), col("label")) < col("label"))
            .as("changed"))
    }
    var round = 0
    var converged = false
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    while (!converged && round < maxRounds) {
      val t0 = System.nanoTime()
      // ONE step per action. (A two-steps-per-action batch was A/B
      // probed and is SLOWER — 3.6 s vs 2.5 s on the dedup_clusters
      // pair set — the doubled per-action plan plus the extra no-op
      // round past convergence cost more than the saved job.) The
      // LAZY checkpoint is materialized by the convergence count —
      // one job per round instead of an eager-checkpoint job plus a
      // count job (the Bfs.levelsImpl pattern).
      val next = step(labels).localCheckpoint(false)
      val changed = next.filter(col("changed")).count()
      labels = next.select(col("v"), col("next_label").as("label"))
      converged = changed == 0
      round += 1
      if (dbg) println(f"[cc] round=$round changed=$changed " +
        f"took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    edges.unpersist(false)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxRounds rounds — " +
          "the graph's diameter exceeds the bound (near-dup clusters " +
          "never do; for long-path graphs raise maxRounds). Returning " +
          "partial labels would silently split components.")
    labels.select(col("v").as("vertex"), col("label").as("component"))
  }

  /** One survivor per duplicate cluster: every vertex of each component
    * except its minimum id is a loser. Input pairs, output (loser,
    * kept) — the anti-join feed for the final dedup.
    */
  def clusterLosers(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    connectedComponents(pairs, aCol, bCol)
      .filter(col("vertex") =!= col("component"))
      .select(col("vertex").as("loser"), col("component").as("kept"))
}
