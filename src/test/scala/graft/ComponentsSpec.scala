package graft

import graft.ops.{Components, Dedup}
import org.apache.spark.sql.functions._

/** Connected components vs driver-side union-find ground truth. */
class ComponentsSpec extends SparkSpec {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize every vertex to its root (min id by construction above)
    parent.keys.map(v => v -> find(v)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    val got = Components.connectedComponents(
        edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.releaseCaches()
    val expect = unionFind(edges)
    assert(got == expect)
  }

  test("random graph matches union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(200)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    check(edges)
  }

  test("chain (worst diameter for label propagation) converges") {
    // a path 0-1-2-...-15 takes multiple rounds; all must land on 0
    check((0L until 15L).map(i => (i, i + 1)))
  }

  test("disjoint cliques keep distinct components") {
    val clique = (lo: Long) =>
      for (i <- lo until lo + 4; j <- i + 1 until lo + 4) yield (i, j)
    check(clique(0) ++ clique(100) ++ clique(200))
  }

  test("refuses to return unconverged labels when diameter exceeds maxRounds") {
    import spark.implicits._
    val path = (0L until 12L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(path, "a", "b", maxRounds = 4).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    Dedup.releaseCaches()
  }

  test("clusterLosers keeps exactly one survivor per cluster") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val losers = Components.clusterLosers(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Dedup.releaseCaches()
    assert(losers == Map(2L -> 1L, 3L -> 1L, 11L -> 10L))
  }
}
