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
    */
  def levels(edges: DataFrame, aCol: String, bCol: String, source: Long,
      maxDepth: Int, broadcastFrontierMax: Long = 4L << 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val und = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(edges.select(col(bCol).as("u"), col(aCol).as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var visited = Seq((source, 0L)).toDF("node", "lvl").localCheckpoint(true)
    var frontier = visited.select($"node")
    var frontierSize = 1L
    var depth = 0
    while (frontierSize > 0 && depth < maxDepth) {
      depth += 1
      val f = if (frontierSize <= broadcastFrontierMax) broadcast(frontier)
              else frontier
      val next = f.join(und, f("node") === und("u"))
        .select(und("v").as("node"))
        .dropDuplicates("node")
        .join(visited, Seq("node"), "left_anti")
        .select($"node", lit(depth.toLong).as("lvl"))
        .localCheckpoint(true)
      frontierSize = next.count() // cheap: counts the checkpointed RDD
      if (frontierSize > 0) {
        visited = visited.unionAll(next)
        frontier = next.select($"node")
      }
    }
    und.unpersist(false)
    visited
  }
}
