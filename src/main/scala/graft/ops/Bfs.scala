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
    */
  def levels(edges: DataFrame, aCol: String, bCol: String, source: Long,
      maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val und = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .union(edges.select(col(bCol).as("u"), col(aCol).as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var visited = Seq((source, 0L)).toDF("node", "lvl").localCheckpoint(true)
    var frontier = visited
    var depth = 0
    var exhausted = false
    while (!exhausted && depth < maxDepth) {
      depth += 1
      val next = frontier.join(und, frontier("node") === und("u"))
        .select(und("v").as("node"), lit(depth.toLong).as("lvl"))
        .distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(true)
      if (next.isEmpty) exhausted = true
      else {
        visited = visited.unionAll(next).localCheckpoint(true)
        frontier = next
      }
    }
    und.unpersist(false)
    visited
  }
}
