package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** PageRank vs a driver-side reference with identical fixed-point
  * integer semantics — exact equality expected, any partitioning.
  */
class PageRankSpec extends SparkSpec {

  /** Same recurrence as ops.PageRank, computed sequentially. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = edges.distinct.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = PageRank.Scale * 15 / 100 / n
    var pr = nodes.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      edges.distinct.foreach { case (s, d) =>
        inflow(d) += pr(s) / outdeg(s)
      }
      pr = nodes.map(v => v -> (base + inflow(v) * 85 / 100)).toMap
    }
    pr
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("random directed graph matches the sequential reference exactly") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }.distinct
    assert(run(edges, 3) == reference(edges, 3))
  }

  test("star graph: hub collects its spokes' mass") {
    val spokes = (1L to 10L).map(i => (i, 0L))
    val got = run(spokes, 2)
    val ref = reference(spokes, 2)
    assert(got == ref)
    // the hub outranks every spoke
    val hub = got(0L)
    assert((1L to 10L).forall(i => got(i) < hub))
  }

  test("node with no in-edges settles at the teleport floor") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L))
    val got = run(edges, 3)
    val n = 3
    assert(got(1L) == PageRank.Scale * 15 / 100 / n)
    assert(got == reference(edges, 3))
  }
}
