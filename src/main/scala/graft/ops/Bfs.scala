package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Breadth-first search over an edge list: shortest hop-distance from a
  * source vertex, the "how far is everything from here" primitive next
  * to `Components` (reachability) and `PageRank` (centrality).
  *
  * Scale posture: classic frontier expansion — each round shuffles only
  * the CURRENT frontier joined against the (persisted) adjacency list,
  * then anti-joins the visited set; rounds are bounded by `maxDepth`.
  * Like `Components`, every round eagerly localCheckpoints so the plan
  * doesn't grow exponentially with iteration count, and the emptiness
  * test is an aggregate, never a collect of data rows. No driver-side
  * graph state.
  */
object Bfs {

  /** (node, lvl) for every vertex within `maxDepth` hops of `source`
    * over the undirected graph given by `edges` (any orientation;
    * both directions are expanded). Unreachable vertices are absent.
    *
    * Per-round shape: the frontier is usually tiny next to the
    * adjacency, so while it fits (`broadcastFrontierMax` rows, counted
    * exactly on the materialized checkpoint — no stats guessing) the
    * expansion join BROADCASTS it and the persisted adjacency never
    * shuffles; only past that bound does the round fall back to a
    * shuffle join. Candidates dedup on `node` alone (the level is a
    * per-round constant), so the anti-join against the visited set
    * reuses the dedup's hash(node) exchange instead of re-shuffling.
    * The visited set is a union of per-round checkpoints — linear
    * lineage, never re-materialized whole.
    *
    * Round batching: each materialization round expands AS MANY levels
    * as the provable frontier bound allows — level d from the counted
    * frontier, each further level from the previous level's plan
    * fragment inside the same job (its dedup exchange is written once
    * and reused by its consumers) — then checkpoints and counts once.
    * The per-round checkpoint + count + planning overhead dominates an
    * iterative operator at bench SF, so fewer materialization rounds
    * is the lever; the per-level plan shape (broadcast expansion over
    * the never-shuffled adjacency) is unchanged. A mid-batch level's
    * frontier size is unknown when the job is planned, so its
    * broadcast is gated by a PROVABLE bound, not a growth guess:
    * level d's row count is at most (level d−1 bound) × maxDegree,
    * with maxDegree computed exactly ONCE from the persisted
    * adjacency. A hub vertex raises maxDegree and simply shortens the
    * batch — the round falls back toward single-level steps with
    * exact counts, never a blind broadcast that could blow the driver
    * on a super-hub expansion.
    *
    * The visited-set anti-join broadcasts too while the EXACT visited
    * row count (maintained from each round's materialized count) fits
    * the same cap — without the hint the checkpointed visited table
    * has no stats, Catalyst assumes it enormous, and every level pays
    * a full sort-merge anti-join (two exchanges + sorts) against a
    * table that local mode knows is tiny. Past the cap it falls back
    * to the shuffled anti-join, the correct shape for a 100 TB graph.
    */
  def levels(edges: DataFrame, aCol: String, bCol: String, source: Long,
      maxDepth: Int, broadcastFrontierMax: Long = 4L << 20): DataFrame =
    levelsImpl(edges, aCol, bCol, source, maxDepth, broadcastFrontierMax,
      eagerCkpt = false)

  /** `eagerCkpt` is the ProbeBfs A/B knob: eager = the historical
    * checkpoint-then-count (two jobs per round); lazy (shipped) lets
    * the round's ONE count action materialize the checkpoint as it
    * runs — same blocks, same truncation, half the job launches.
    *
    * MEASURED FLOOR (closes the three-round `q_bfs_levels` perf flag):
    * ProbeBfs at sf0.1, alternating reps in ONE JVM so machine drift
    * cancels — loop only, derivation excluded: eager 4.71/4.06/4.51/
    * 3.61 s vs lazy 5.41/3.83/4.42/3.74 s (means 4.22 vs 4.35 —
    * inside noise). Halving the job count does not move the needle,
    * so per-round scheduling is NOT the remaining cost; the loop
    * floors at ~4 s for this 31k-edge graph on the bench VM. The
    * other half of the committed number is the co-supply edge
    * DERIVATION, which the same probe calibrates at 4.6–4.9 s for
    * BOTH derivation variants vs 0.9 s for the raw two-column
    * distinct — the md5-sampled pair comprehension is the price, and
    * md5 must stay: the edge set surfaces in oracled output, so both
    * engines must agree on it byte-for-byte. The plan itself is the
    * scale-correct frontier expansion (adjacency never reshuffles,
    * frontier broadcasts under an exact degree bound); the bench
    * number is machine-bound, not plan-bound.
    */
  private[graft] def levelsImpl(edges: DataFrame, aCol: String,
      bCol: String, source: Long, maxDepth: Int,
      broadcastFrontierMax: Long, eagerCkpt: Boolean): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val und = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(edges.select(col(bCol).as("u"), col(aCol).as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var visitedCount = 1L
    def expand(frontier: DataFrame, bcast: Boolean, visited: DataFrame,
        lvl: Long): DataFrame = {
      // fresh attribute for the frontier key: a batched deeper level
      // feeds a fragment of `und` itself back in, and an unrenamed
      // column would make the frontier⋈adjacency join self-ambiguous
      val f0 = frontier.select($"node".as("__bfs_f"))
      val f = if (bcast) broadcast(f0) else f0
      // broadcast the visited side of the anti-join while its EXACT
      // row count (from the rounds' materialized counts) fits the cap
      // — the checkpointed table has no stats, so without the hint
      // every level pays a sort-merge anti-join against a table local
      // mode knows is tiny
      val vis = if (visitedCount <= broadcastFrontierMax) broadcast(visited)
                else visited
      // name-based references: the left side exposes only __bfs_f, so
      // u/v resolve to the adjacency unambiguously (und(...) dataset
      // references would trip the self-join detector here)
      f.join(und, $"__bfs_f" === $"u")
        .select($"v".as("node"))
        .dropDuplicates("node")
        .join(vis, Seq("node"), "left_anti")
        .select($"node", lit(lvl).as("lvl"))
    }

    var visited = Seq((source, 0L)).toDF("node", "lvl").localCheckpoint(true)
    var frontier = visited.select($"node")
    var frontierSize = 1L
    var depth = 0
    val dbg = sys.env.contains("GRAFT_BFS_DEBUG")
    // exact one-time degree bound for the batched levels' broadcasts:
    // |level d| ≤ |level d−1 bound| × maxDeg, so broadcasting level
    // d's frontier mid-job is safe iff the running bound fits the cap.
    // Evaluated lazily (only if a round qualifies for batching) over
    // the already-persisted adjacency — one tiny aggregate, once.
    lazy val maxDeg: Long = {
      val r = und.groupBy($"u").agg(count(lit(1)).as("d"))
        .agg(max($"d")).head()
      if (r.isNullAt(0)) 1L else math.max(r.getLong(0), 1L)
    }
    while (frontierSize > 0 && depth < maxDepth) {
      val t0 = System.nanoTime()
      depth += 1
      val bc = frontierSize <= broadcastFrontierMax
      val lvl1 = expand(frontier, bc, visited, depth.toLong)
      // batch further levels into the SAME materialization while the
      // provable bound keeps every mid-batch frontier broadcastable:
      // bound(level d+k) = frontierSize × maxDeg^k, never a guess.
      // Each batched level excludes visited (inside expand) plus the
      // union of the batch's earlier levels via one anti-join.
      // Batch at most ONE extra level into the same materialization
      // (two per round): each batched level references the previous
      // level's un-materialized fragment ~3× (frontier, exclusion,
      // union), so fragment re-execution grows 3^k with batch depth —
      // a 4-level batch was probed at 9–27 s/round vs ~2.5 s for the
      // 2-level round it replaced (r15 probe; ReuseExchange does not
      // recover a fragment referenced through a broadcast). Two levels
      // is the measured optimum. The second level's frontier size is
      // unknown mid-job, so its broadcast is gated by the PROVABLE
      // bound frontierSize × maxDeg, never a growth guess.
      val pair = depth < maxDepth && bc &&
        frontierSize <= broadcastFrontierMax / maxDeg
      val next =
        (if (!pair) lvl1
        else {
          depth += 1
          // level d+1 from level d's fragment: the exclusion set is
          // visited ∪ lvl1 (nodes at distance ≤ d); lvl1 stays
          // UN-hinted here so its dedup exchange serves all three
          // references via ReuseExchange (a broadcast hint would
          // re-execute the fragment per reference — probed slower)
          val f1 = lvl1.select($"node")
          val lvl2 = expand(f1, bcast = true, visited, depth.toLong)
            .join(f1, Seq("node"), "left_anti")
          lvl1.unionAll(lvl2)
        }).localCheckpoint(eagerCkpt)
      // one tiny job: the count action below materializes the (lazy)
      // checkpoint blocks AND folds total rows + the deepest level's
      // rows (the next frontier) together — later references replay
      // from the truncated checkpoint lineage either way
      val (total, lastCount) = {
        val r = next.agg(count(lit(1)),
          count(when($"lvl" === depth.toLong, 1))).head()
        (r.getLong(0), r.getLong(1))
      }
      if (total > 0) visited = visited.unionAll(next)
      visitedCount += total
      frontier = next.filter($"lvl" === depth.toLong).select($"node")
      frontierSize = lastCount
      if (dbg) println(f"[bfs] depth=$depth total=$total last=$lastCount " +
        f"took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    und.unpersist(false)
    visited
  }
}
