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
  private def searchLayer(q: Array[Float],
      vecs: scala.collection.IndexedSeq[Array[Float]],
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
      val vw = scala.collection.immutable.ArraySeq.unsafeWrapArray(vecs)
      var eps = Seq(entry)
      var l = levels(entry)
      while (l > 0) {
        val lvl = l
        eps = Seq(searchLayer(q, vw,
          (c: Int) => scala.collection.immutable.ArraySeq.unsafeWrapArray(
            nbrs(lvl)(c)), eps, 1).head._1)
        l -= 1
      }
      searchLayer(q, vw,
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
      efConstruction: Int): ShardGraph = insertAll(None, rows, m, efConstruction)

  /** Insert `rows` (sorted by id) into `base` — HNSW inserts are the
    * paper's own incremental-maintenance path, so appending to an
    * existing shard graph IS the build loop continued: the base's
    * nodes, levels, links and entry point carry over untouched except
    * where a new node's backlinks trim an overflowing neighbor list.
    */
  private[ops] def insertAll(base: Option[ShardGraph],
      rows: Array[(Long, Array[Float])], m: Int,
      efConstruction: Int): ShardGraph = {
    val ids = mutable.ArrayBuffer.empty[Long]
    val vecs = mutable.ArrayBuffer.empty[Array[Float]]
    val levels = mutable.ArrayBuffer.empty[Int]
    // adj(level)(node); levels and nodes both grow
    val adj = mutable.ArrayBuffer.empty[mutable.ArrayBuffer[mutable.ArrayBuffer[Int]]]
    var entry = -1
    var entryLevel = -1
    base.foreach { g =>
      ids ++= g.ids
      vecs ++= g.vecs
      levels ++= g.levels
      g.nbrs.foreach { lvl =>
        adj += mutable.ArrayBuffer.from(lvl.map(a => mutable.ArrayBuffer.from(a)))
      }
      if (g.ids.nonEmpty) { entry = g.entry; entryLevel = g.levels(g.entry) }
    }
    def ensureCapacity(upToLevel: Int): Unit = {
      val n = ids.length
      while (adj.length <= upToLevel)
        adj += mutable.ArrayBuffer.fill(n)(mutable.ArrayBuffer.empty[Int])
      adj.foreach { la =>
        while (la.length < n) la += mutable.ArrayBuffer.empty[Int]
      }
    }
    def capOf(level: Int) = if (level == 0) 2 * m else m
    val sorted = rows.sortBy(_._1)
    var r = 0
    while (r < sorted.length) {
      val (id, v) = sorted(r)
      val i = ids.length
      val lvl = levelOf(id, m)
      ids += id; vecs += v; levels += lvl
      ensureCapacity(math.max(lvl, math.max(entryLevel, 0)))
      if (entry < 0) { entry = i; entryLevel = lvl }
      else {
        var eps = Seq(entry)
        var l = entryLevel
        while (l > lvl) { // greedy descent above the node's level
          val lv = l
          eps = Seq(searchLayer(v, vecs, (c: Int) => adj(lv)(c),
            eps, 1).head._1)
          l -= 1
        }
        var level = math.min(lvl, entryLevel)
        while (level >= 0) {
          val lv = level
          val w = searchLayer(v, vecs, (c: Int) => adj(lv)(c), eps,
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
      r += 1
    }
    new ShardGraph(ids.toArray, vecs.toArray, levels.toArray,
      adj.map(_.map(_.toArray.distinct).toArray).toArray,
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
          Iterator.single((TaskContext.getPartitionId(), rows.length.toLong,
            serialize(g)))
        }
      }
      .toDF("shard", "n", "graph")
  }

  /** Incremental maintenance — the IVF-append analogue for the graph
    * tier ([[Similarity.appendToIvfIndex]]): new vectors route to
    * their shard by the SAME hash rule the build used
    * (`pmod(hash(id), shards)` is exactly `repartition(shards, id)`'s
    * partition id), and ONLY the touched shards deserialize, continue
    * the paper's own incremental insert loop ([[insertAll]]) and
    * re-serialize — O(new vectors × log shard), untouched shard rows
    * pass through byte-identical. A shard with no prior row (possible
    * when the build saw no vector for it) gets a fresh graph. Unlike
    * IVF's append (assignment to FIXED centroids ≡ whole-built), an
    * HNSW graph is insert-order dependent, so the contract is recall
    * parity, not graph identity — the spec asserts it.
    */
  def appendToShardedIndex(index: DataFrame, newVectors: DataFrame,
      idCol: String, vecCol: String, shards: Int,
      m: Int = 8, efConstruction: Int = 64): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val fresh = newVectors
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"))
      .withColumn("shard", pmod(hash($"id"), lit(shards)).cast("int"))
      .groupBy($"shard")
      .agg(collect_list(struct($"id", $"v")).as("incoming"))
    val untouched = index.join(fresh.select($"shard"), Seq("shard"), "left_anti")
    val updated = index.join(fresh, Seq("shard"), "right_outer")
      .select($"shard", $"graph", $"incoming")
      .as[(Int, Array[Byte], Seq[(Long, Array[Float])])]
      .map { case (shard, graphBytes, incoming) =>
        val g = insertAll(Option(graphBytes).map(deserialize),
          incoming.toArray, m, efConstruction)
        (shard, g.ids.length.toLong, serialize(g))
      }
      .toDF("shard", "n", "graph")
    untouched.unionByName(updated)
  }

  /** Probe every shard graph with every query and merge per-query
    * top-k (cosine desc, id tie-break — [[Similarity.bruteForceTopK]]'s
    * output shape). The query set is bounded model-side state under
    * the same contract as the brute-force broadcast join; each task
    * deserializes its shard's graph ONCE and runs all queries through
    * it.
    */
  /** Persist a sharded index as ONE raw binary object per shard under
    * `dir` (`shard-<id>.bin`, rewritten in place) — the side-channel
    * layout [[probeStreaming]] tasks read directly through the Hadoop
    * FS API. This is what lets a CORPUS-SCALE query stream meet the
    * graphs without broadcasting either side: the index lives on
    * shared storage, each probe task pulls only the shard it serves.
    */
  /** Executor-side Hadoop configuration: classpath defaults (the
    * standard cluster deployment) plus the caller's serialized
    * overrides — the hook a custom-conf deployment (exotic credentials
    * provider, non-classpath object store) threads its settings
    * through; `fsConf` is a plain String map, so it ships inside the
    * task closure with no Configuration serialization.
    */
  private[ops] def taskConf(fsConf: Map[String, String])
      : org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration()
    fsConf.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** The session's `spark.hadoop.*` settings as executor-shippable
    * overrides — the standard way object-store credentials reach a
    * Spark session. Merged UNDER the caller's explicit `fsConf`, so
    * a session-configured s3a deployment works with zero extra
    * plumbing while an explicit override still wins.
    */
  private[ops] def sessionFsOverrides(
      spark: org.apache.spark.sql.SparkSession): Map[String, String] =
    spark.conf.getAll.collect {
      case (k, v) if k.startsWith("spark.hadoop.") =>
        k.stripPrefix("spark.hadoop.") -> v
    }

  /** Serialization format version, written as a `_graft_hnsw_format`
    * marker next to the shard files: a reused index dir from an OLDER
    * build whose graph codec differs must rebuild, never deserialize
    * garbage ([[Similarity.marginMiningAnn]]'s `reuseIndexes` checks
    * the marker). Bump when [[serialize]] changes shape.
    */
  private[ops] val FormatVersion = "1"
  private[ops] val FormatMarker = "_graft_hnsw_format"

  def saveShardedIndex(index: DataFrame, dir: String,
      fsConf: Map[String, String] = Map.empty): Unit = {
    val spark = index.sparkSession
    import spark.implicits._
    val conf = sessionFsOverrides(spark) ++ fsConf
    // pin the rows BEFORE clearing the destination: the index DF may
    // itself read this dir (the load → append → save-in-place flow) —
    // a lazy plan over files the pre-clean just deleted would read
    // nothing
    val rows = index.select(col("shard").cast("int"), col("graph"))
      .as[(Int, Array[Byte])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rows.count()
    // pre-clean: a re-save with FEWER shards must not leave stale
    // higher-numbered shard files that a later probe would refuse (or
    // worse, search)
    val dp = new org.apache.hadoop.fs.Path(dir)
    val fsD = dp.getFileSystem(taskConf(conf))
    if (fsD.exists(dp)) fsD.delete(dp, true)
    rows.foreachPartition { it: Iterator[(Int, Array[Byte])] =>
      it.foreach { case (s, bytes) =>
        val p = new org.apache.hadoop.fs.Path(dir, f"shard-$s%05d.bin")
        val fs = p.getFileSystem(taskConf(conf))
        val out = fs.create(p, true)
        try out.write(bytes) finally out.close()
      }
    }
    rows.unpersist(false)
    val out = fsD.create(new org.apache.hadoop.fs.Path(dp, FormatMarker), true)
    try out.write(FormatVersion.getBytes("UTF-8")) finally out.close()
  }

  /** Read a [[saveShardedIndex]] side-channel layout back into the
    * (shard, n, graph) DataFrame shape the build/append APIs speak —
    * the round trip behind incremental re-mining: load, append the
    * new vectors ([[appendToShardedIndex]] touches only their
    * shards), save. One binaryFile row per shard; `n` recomputes from
    * the graph (executor-side, no driver deserialization).
    */
  def loadShardedIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "shard-*.bin").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val shard = p.substring(p.lastIndexOf("shard-") + 6,
          p.lastIndexOf(".bin")).toInt
        (shard, deserialize(bytes).ids.length.toLong, bytes)
      }
      .toDF("shard", "n", "graph")
  }

  private def loadShard(dir: String, shard: Int,
      fsConf: Map[String, String]): Option[ShardGraph] = {
    val p = new org.apache.hadoop.fs.Path(dir, f"shard-$shard%05d.bin")
    val fs = p.getFileSystem(taskConf(fsConf))
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val len = fs.getFileStatus(p).getLen.toInt
        val bytes = new Array[Byte](len)
        in.readFully(bytes)
        Some(deserialize(bytes))
      } finally in.close()
    }
  }

  /** CORPUS-SCALE probe: the query side stays a DataFrame end to end —
    * no driver collect, no broadcast. Each query row fans out to every
    * shard id (|Q|·shards probe rows, the sharding fan-out — NOT
    * corpus × corpus), repartitions by shard so a task serves one
    * shard's whole query stream, loads that shard's graph ONCE from
    * the [[saveShardedIndex]] side channel, and streams searches
    * through it. Per-query top-k merges across shards with the same
    * (cosine desc, id) rule as [[probe]]. `excludeSelf = false` keeps
    * same-id matches — cross-lingual mining uses aligned id spaces
    * where dropping them would drop true pairs.
    */
  def probeStreaming(queries: DataFrame, indexDir: String, shards: Int,
      idCol: String, vecCol: String, k: Int, ef: Int = 64,
      excludeSelf: Boolean = true,
      fsConf: Map[String, String] = Map.empty): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val conf = sessionFsOverrides(spark) ++ fsConf
    // a shards argument below the persisted layout's shard count
    // would silently skip whole shards — refuse loudly instead
    // (missing files BELOW the count are legitimately empty shards)
    locally {
      val dp = new org.apache.hadoop.fs.Path(indexDir)
      val fsD = dp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fsD.exists(dp)) {
        val ids = fsD.listStatus(dp).map(_.getPath.getName)
          .filter(_.matches("shard-[0-9]+[.]bin"))
          .map(n => n.stripPrefix("shard-").stripSuffix(".bin").toInt)
        require(ids.forall(_ < shards),
          s"index at $indexDir holds shard ${ids.max} but the probe " +
            s"was asked for $shards shards — whole shards would be " +
            "silently skipped; pass the layout's own shard count")
      }
    }
    val tagged = queries
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"))
      .withColumn("shard", explode(sequence(lit(0), lit(shards - 1))))
      .repartition(shards, col("shard"))
      // a hash partition can hold several shards' rows — group them so
      // each graph loads once per task, not once per interleaving run
      .sortWithinPartitions(col("shard"))
    val raw = tagged.select($"shard", $"id", $"v")
      .as[(Int, Long, Array[Float])]
      .mapPartitions { it =>
        var cached = -1
        var g: Option[ShardGraph] = None
        it.flatMap { case (s, qid, qv) =>
          if (s != cached) { cached = s; g = loadShard(indexDir, s, conf) }
          g.iterator.flatMap { graph =>
            val kk = if (excludeSelf) k + 1 else k
            graph.search(qv, kk, ef).iterator
              .filter { case (nid, _) => !excludeSelf || nid != qid }
              .take(k)
              .map { case (nid, sc) => (qid, nid, sc) }
          }
        }
      }
      .toDF("query_id", "neighbor_id", "cosine")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id")
    raw.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cosine")
  }

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
      // duplicate ids can enter the index (an append re-inserting an
      // existing id routes by hash and lands a copy in some shard);
      // without this a neighbor could hold two top-k slots — match
      // Similarity.bruteForceTopK's dropDuplicates output contract.
      // Copies of one id carry the same vector, so cosine agrees and
      // dedup on the pair is exact.
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id")
    raw.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= k)
      .select($"query_id", $"rank", $"neighbor_id", $"cosine")
  }
}
