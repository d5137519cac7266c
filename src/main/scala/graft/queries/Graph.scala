package graft.queries

import graft.Tables
import graft.ops.PageRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph queries over edge lists derived from the star schema
  * (SURVEY.md §2 — iterative operators next to connected components).
  */
object Graph {

  /** PageRank over the supplier→customer trade graph (edge = supplier
    * shipped a line to the customer's order; customers offset by 1e5
    * into a disjoint node-id space). Three fixed-point integer
    * iterations (`ops.PageRank`) — bit-identical to the oracle's
    * unrolled SQL because every step is integer math. Top 100 nodes.
    */
  def qPagerank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val edges = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(s, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey".cast("long").as("src"),
        ($"o_custkey" + lit(100000L)).as("dst"))
      .distinct()
    PageRank.run(edges, iters = 3)
      .orderBy($"pr".desc, $"node")
      .limit(100)
  }
}
