package graft.queries

import graft.Tables
import graft.ops.{Bfs, PageRank}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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

  /** Hash-sparsified co-supply graph: an undirected edge links two
    * suppliers that ship the same part (canonical u < v), thinned to a
    * deterministic 1/16 by md5 edge hash — both the content-hash
    * subgraph-sampling idiom and a density control (the full co-supply
    * graph tends toward a clique as SF grows). Derivation is two
    * shuffles: distinct (part, supplier), then the per-part pair
    * self-join — co-partitioned on the part key, and per-part supplier
    * lists are dim-bounded so the pair expansion is, too. (An
    * array-comprehension variant — groupBy(part) + collect_set +
    * in-place pair explode — benched equal-to-slower at sf0.1: the
    * ObjectHashAggregate's array state costs more than the
    * co-partitioned join it saves.)
    */
  private[graft] def coSupplyEdges(s: SparkSession, dir: String,
      keepHex: String = "10"): DataFrame = {
    import s.implicits._
    // the distinct (part, supplier) table feeds BOTH sides of the pair
    // self-join — persist it so the lineitem scan + distinct exchange
    // run once, not once per side (the un-persisted plan re-scanned
    // parquet and re-aggregated for the broadcast side; guide §2.4)
    val ps = graft.ops.Dedup.tracked(Tables.lineitem(s, dir)
      .select($"l_partkey".as("p"), $"l_suppkey".as("sk")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK))
    ps.as("a").join(ps.as("b"), $"a.p" === $"b.p" && $"a.sk" < $"b.sk")
      .select($"a.sk".as("u"), $"b.sk".as("v")).distinct()
      .filter(substring(md5(concat_ws(",", $"u", $"v")), 1, 2) < keepHex)
  }

  /** Triangle census of the co-supply graph: node/edge counts, wedge
    * (open-triple) count, triangle count, global clustering
    * coefficient. Engine plan is the degree-ordered orientation
    * algorithm (each undirected edge directed from its lower-(degree,
    * id) endpoint): wedge generation at each vertex is bounded by its
    * OUT-degree ≤ √(2m), so the candidate join stays near-linear where
    * the naive three-way join explodes on hubs — the standard
    * MapReduce triangle scheme. Each triangle is counted exactly once,
    * at its minimum-rank vertex; the oracle counts the same set via the
    * a<b<c canonical join.
    */
  def qTriangles(s: SparkSession, dir: String): DataFrame =
    qTrianglesKnob(s, dir, "10")

  /** [[qTriangles]] with the edge-thinning threshold as a KNOB: the
    * md5-prefix keep fraction is keepHex/0x100 (the oracled key pins
    * "10" = 1/16). Used by [[graft.TriangleKnobs]] to measure the
    * time-vs-wedge trend at several densities of the SAME graph — the
    * cheap complement to another 10x scale point, and the density
    * control a 100 TB run would turn when the co-occurrence graph
    * approaches a clique.
    */
  def qTrianglesKnob(s: SparkSession, dir: String,
      keepHex: String): DataFrame = {
    // the threshold compares LEXICALLY against lowercase md5 hex — an
    // uppercase or odd-length value would silently shift the keep
    // fraction instead of erroring
    require(keepHex.matches("[0-9a-f]{2}"),
      s"keepHex must be two lowercase hex digits, got '$keepHex'")
    import s.implicits._
    val e = graft.ops.Dedup.tracked(
      coSupplyEdges(s, dir, keepHex).persist(StorageLevel.MEMORY_AND_DISK))
    val und = e.select($"u", $"v").unionAll(e.select($"v".as("u"), $"u".as("v")))
    // the degree table feeds THREE consumers (both rank-join sides and
    // the wedge-count aggregate) — persist it so the union + aggregate
    // over the edge cache runs once, not three times (guide §2.4); it
    // is O(nodes) rows, the smallest table in the query
    val deg = graft.ops.Dedup.tracked(
      und.groupBy($"u".as("n")).agg(count(lit(1)).as("d"))
        .persist(StorageLevel.MEMORY_AND_DISK))
    val ranked = e
      .join(deg.select($"n".as("n1"), $"d".as("d1")), $"u" === $"n1")
      .join(deg.select($"n".as("n2"), $"d".as("d2")), $"v" === $"n2")
    val oriented = graft.ops.Dedup.tracked(ranked.select(
        when($"d1" < $"d2" || ($"d1" === $"d2" && $"u" < $"v"), $"u")
          .otherwise($"v").as("s"),
        when($"d1" < $"d2" || ($"d1" === $"d2" && $"u" < $"v"), $"v")
          .otherwise($"u").as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK))
    val wedges = oriented.as("x").join(oriented.as("y"),
        $"x.s" === $"y.s" && $"x.t" < $"y.t")
      .select($"x.t".as("a"), $"y.t".as("b"))
    val tri = wedges.join(e,
        least($"a", $"b") === $"u" && greatest($"a", $"b") === $"v")
      .agg(count(lit(1)).as("n_triangles")).withColumn("k", lit(1))
    val shape = deg.agg(count(lit(1)).as("n_nodes"),
        expr("sum(d * (d - 1) div 2)").as("n_wedges")).withColumn("k", lit(1))
    val edges = e.agg(count(lit(1)).as("n_edges")).withColumn("k", lit(1))
    shape.join(edges, "k").join(tri, "k")
      .select($"n_nodes", $"n_edges", $"n_wedges", $"n_triangles",
        ((lit(3.0) * $"n_triangles") / $"n_wedges").as("gcc"))
  }

  /** BFS hop-distance over the co-supply graph from its minimum
    * supplier id, depth-capped at 6 (`ops.Bfs` frontier expansion —
    * one frontier⋈adjacency shuffle per level, lineage truncated per
    * round). The oracle walks the same graph with a recursive CTE and
    * takes MIN(level) per node.
    */
  def qBfsLevels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = coSupplyEdges(s, dir).persist(StorageLevel.MEMORY_AND_DISK)
    val src = e.agg(min($"u")).as[Option[Long]].head()
    val out = src match {
      case Some(v) => Bfs.levels(e, "u", "v", v, maxDepth = 6)
      case None => Seq.empty[(Long, Long)].toDF("node", "lvl")
    }
    e.unpersist(false)
    out.orderBy($"node")
  }
}
