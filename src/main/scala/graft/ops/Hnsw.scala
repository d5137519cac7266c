package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Graph-index ANN tier (HNSW — Malkov & Yashunin, "Efficient and
  * robust approximate nearest neighbor search using Hierarchical
  * Navigable Small World graphs", TPAMI'18): the recall-critical
  * final-ranking tier next to the coarse IVF/LSH/PQ tiers in
  * [[Similarity]].
  *
  * Distribution model is SHARDING — the same scheme production vector
  * stores use for graph indexes, because an HNSW graph is a
  * sequential pointer structure that does not partition: the corpus
  * hash-partitions into `shards`, each executor builds an independent
  * in-memory graph over ITS slice (`mapPartitions` — the one place a
  * pointer-chasing index genuinely cannot be a Catalyst plan), each
  * graph serializes to one binary row, and a probe fans every query
  * out to all shard graphs and merges per-query top-k (a tiny rank
  * shuffle). 100 TB posture: a shard is the unit that fits one
  * executor's memory; shard count scales the corpus out; queries ride
  * a broadcast (the small side by contract, exactly like
  * [[Similarity.bruteForceTopK]]'s broadcast join); index rows are
  * plain parquet-writable bytes — build once, probe forever.
  *
  * Everything is DETERMINISTIC: level assignment derives from a
  * splitmix64 scramble of the vector id (no RNG), inserts run in
  * sorted-id order, and every candidate ordering breaks ties on node
  * index — two builds over the same shard produce identical graphs,
  * so recall specs and parquet round-trips are reproducible.
  */
object Hnsw {

  private def cosineSim(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      s += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else s / math.sqrt(na * nb)
  }

  /** Classic best-first layer search maximizing cosine over an
    * adjacency accessor (shared by construction, which reads growing
    * buffers, and querying, which reads frozen arrays): expand the
    * most-similar frontier node while it can improve the worst of the
    * `ef` best found. Returns the `ef` best as (node, sim), cosine
    * desc with index tie-break.
    */
  private def searchLayer(q: Array[Float], vecs: Array[Array[Float]],
      adjOf: Int => scala.collection.IndexedSeq[Int], eps: Seq[Int],
      ef: Int): mutable.ArrayBuffer[(Int, Double)] = {
    // max-heap on (sim, -index): equal sims dequeue the smaller index
    val byBest: Ordering[(Double, Int)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int.reverse)
    val visited = new java.util.BitSet(vecs.length)
    val cand = mutable.PriorityQueue.empty[(Double, Int)](byBest)
    val res = mutable.PriorityQueue.empty[(Double, Int)](byBest.reverse)
    eps.foreach { e =>
      if (!visited.get(e)) {
        visited.set(e)
        val s = cosineSim(q, vecs(e))
        cand.enqueue((s, e)); res.enqueue((s, e))
        if (res.size > ef) res.dequeue()
      }
    }
    var continue = cand.nonEmpty
    while (continue) {
      val (cs, c) = cand.dequeue()
      if (res.size >= ef && cs < res.head._1) continue = false
      else {
        val adj = adjOf(c)
        var i = 0
        while (i < adj.length) {
          val n = adj(i)
          if (!visited.get(n)) {
            visited.set(n)
            val s = cosineSim(q, vecs(n))
            if (res.size < ef || s > res.head._1) {
              cand.enqueue((s, n)); res.enqueue((s, n))
              if (res.size > ef) res.dequeue()
            }
          }
          i += 1
        }
        continue = cand.nonEmpty
      }
    }
    val drained: Seq[(Double, Int)] = res.dequeueAll
    val out = mutable.ArrayBuffer.from(drained.map { case (s, i) => (i, s) })
    out.sortInPlaceBy { case (idx, s) => (-s, idx) }
    out
  }

  /** One shard's hierarchical navigable-small-world graph.
    * `nbrs(level)(node)` lists neighbor NODE INDEXES (into `ids`).
    */
  final class ShardGraph(
      val ids: Array[Long],
      val vecs: Array[Array[Float]],
      val levels: Array[Int],
      val nbrs: Array[Array[Array[Int]]],
      val entry: Int) extends Serializable {

    /** Greedy top-layer descent, then an `ef`-beam at layer 0. */
    def search(q: Array[Float], k: Int, ef: Int): Seq[(Long, Double)] = {
      if (ids.isEmpty) return Nil
      var eps = Seq(entry)
      var l = levels(entry)
      while (l > 0) {
        val lvl = l
        eps = Seq(searchLayer(q, vecs,
          (c: Int) => scala.collection.immutable.ArraySeq.unsafeWrapArray(
            nbrs(lvl)(c)), eps, 1).head._1)
        l -= 1
      }
      searchLayer(q, vecs,
        (c: Int) => scala.collection.immutable.ArraySeq.unsafeWrapArray(
          nbrs(0)(c)), eps, math.max(ef, k))
        .take(k).map { case (i, s) => (ids(i), s) }.toSeq
    }
  }

  /** Deterministic level for a vector id: splitmix64 scramble → u ∈
    * (0,1] → floor(−ln(u)·mL), the paper's geometric distribution
    * without an RNG (reproducible builds).
    */
  private[graft] def levelOf(id: Long, m: Int): Int = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    val u = ((z >>> 11).toDouble + 1.0) / (1L << 53).toDouble // (0,1]
    val mL = 1.0 / math.log(m.toDouble)
    math.min((-math.log(u) * mL).toInt, 15)
  }

  /** Build one shard's graph over (id, vec) pairs — inserts in sorted
    * id order; each level keeps the top-`m` most-similar links (2m at
    * layer 0, the paper's Mmax0), trimming a neighbor's list the same
    * way when a backlink overflows it. Construction searches read the
    * growing adjacency buffers directly — no per-insert graph copy.
    */
  private[ops] def buildGraph(rows: Array[(Long, Array[Float])], m: Int,
      efConstruction: Int): ShardGraph = {
    val sorted = rows.sortBy(_._1)
    val ids = sorted.map(_._1)
    val vecs = sorted.map(_._2)
    val n = ids.length
    val levels = ids.map(levelOf(_, m))
    val maxLevel = if (n == 0) 0 else levels.max
    val adj = Array.tabulate(maxLevel + 1)(_ =>
      Array.fill(n)(mutable.ArrayBuffer.empty[Int]))
    def capOf(level: Int) = if (level == 0) 2 * m else m
    var entry = -1
    var entryLevel = -1
    var i = 0
    while (i < n) {
      val lvl = levels(i)
      if (entry < 0) { entry = i; entryLevel = lvl }
      else {
        var eps = Seq(entry)
        var l = entryLevel
        while (l > lvl) { // greedy descent above the node's level
          val lv = l
          eps = Seq(searchLayer(vecs(i), vecs, (c: Int) => adj(lv)(c),
            eps, 1).head._1)
          l -= 1
        }
        var level = math.min(lvl, entryLevel)
        while (level >= 0) {
          val lv = level
          val w = searchLayer(vecs(i), vecs, (c: Int) => adj(lv)(c), eps,
            efConstruction)
          val chosen = w.take(m).map(_._1)
          chosen.foreach { nb =>
            adj(level)(i) += nb
            adj(level)(nb) += i
            val cap = capOf(level)
            if (adj(level)(nb).length > cap) {
              // keep the cap most-similar links (index tie-break)
              val trimmed = adj(level)(nb).toArray.distinct
                .map(x => (cosineSim(vecs(nb), vecs(x)), x))
                .sortBy { case (s, x) => (-s, x) }
                .take(cap).map(_._2)
              adj(level)(nb).clear()
              adj(level)(nb) ++= trimmed
            }
          }
          eps = w.map(_._1).toSeq
          level -= 1
        }
        if (lvl > entryLevel) { entry = i; entryLevel = lvl }
      }
      i += 1
    }
    new ShardGraph(ids, vecs, levels, adj.map(_.map(_.toArray.distinct)),
      math.max(entry, 0))
  }

  private def serialize(g: ShardGraph): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    try out.writeObject(g) finally out.close()
    bos.toByteArray
  }

  private[ops] def deserialize(bytes: Array[Byte]): ShardGraph = {
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try in.readObject().asInstanceOf[ShardGraph] finally in.close()
  }

  /** Materialize the sharded index: one row per shard —
    * (shard, n, graph bytes). Plain parquet-writable; build once,
    * probe many times (the pattern of [[Similarity.buildIvfIndex]],
    * with a navigable graph instead of cell files).
    */
  def buildShardedIndex(corpus: DataFrame, idCol: String, vecCol: String,
      shards: Int, m: Int = 8, efConstruction: Int = 64): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"))
      .as[(Long, Array[Float])]
      .repartition(shards, col("id"))
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val g = buildGraph(rows, m, efConstruction)
          Iterator.single((TaskContext.getPartitionId(), rows.length,
            serialize(g)))
        }
      }
      .toDF("shard", "n", "graph")
  }

  /** Probe every shard graph with every query and merge per-query
    * top-k (cosine desc, id tie-break — [[Similarity.bruteForceTopK]]'s
    * output shape). The query set is bounded model-side state under
    * the same contract as the brute-force broadcast join; each task
    * deserializes its shard's graph ONCE and runs all queries through
    * it.
    */
  def probe(index: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, ef: Int = 64): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val qs = queries
      .select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .as[(Long, Array[Float])].collect()
    val qB = spark.sparkContext.broadcast(qs)
    val raw = index.select(col("graph")).as[Array[Byte]]
      .mapPartitions { it =>
        it.flatMap { bytes =>
          val g = deserialize(bytes)
          qB.value.iterator.flatMap { case (qid, qv) =>
            // k+1 from each shard: the query itself may live in one
            g.search(qv, k + 1, ef).iterator
              .filter { case (nid, _) => nid != qid }
              .map { case (nid, s) => (qid, nid, s) }
          }
        }
      }
      .toDF("query_id", "neighbor_id", "cosine")
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id")
    raw.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cosine")
  }
}
