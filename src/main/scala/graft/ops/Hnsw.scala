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

  /** Default per-shard memory budget for [[buildShardedIndex]]'s
    * pre-flight guard: a shard materializes whole inside one build
    * task (`it.toArray` — the graph is a sequential pointer structure;
    * "shard = executor-fit unit" is the design), so an under-sharded
    * billion-vector build would OOM mid-task with no guidance. 4 GiB
    * leaves headroom in a typical 8–16 GiB executor for the graph's
    * link arrays and the serialization buffer on top of the raw
    * vectors.
    */
  val DefaultMaxShardBytes: Long = 4L << 30

  /** Estimated in-memory bytes per indexed vector: the float payload
    * plus id/level bookkeeping and the per-level adjacency lists
    * (≤ 2m ints at layer 0, m per upper layer, ~1.06 expected levels)
    * with JVM object overhead.
    */
  private def bytesPerVector(dims: Int, m: Int): Long =
    4L * dims + 16L * m + 96L

  /** Materialize the sharded index: one row per shard —
    * (shard, n, graph bytes). Plain parquet-writable; build once,
    * probe many times (the pattern of [[Similarity.buildIvfIndex]],
    * with a navigable graph instead of cell files).
    *
    * SCALE RAIL: each shard builds in ONE task and must fit that
    * task's memory. A pre-flight estimate (one tiny count+dims
    * aggregate) refuses an under-sharded build LOUDLY, naming the
    * shard count that would fit `maxShardBytes` — instead of OOMing
    * an executor hours into a corpus-scale build. Pass
    * `maxShardBytes <= 0` to skip the guard (micro-benchmarks that
    * deliberately overpack a shard).
    */
  def buildShardedIndex(corpus: DataFrame, idCol: String, vecCol: String,
      shards: Int, m: Int = 8, efConstruction: Int = 64,
      maxShardBytes: Long = DefaultMaxShardBytes): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val rows = corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"))
    if (maxShardBytes > 0) {
      // two CHEAP actions: a column-pruned count (no vector bytes
      // decoded) and a BOUNDED null-filtered sample for the
      // dimensionality — a full max(size(v)) aggregate would decode
      // the corpus' largest column end to end just to guard it. The
      // sample is null-filtered (a null leading vector must not NPE
      // or feed size()=-1 into the byte estimate) and takes the MAX
      // over 1024 rows so mildly ragged dimensionality can't
      // under-estimate the budget off one short leading vector.
      val n = rows.count()
      if (n > 0) {
        val dimSample = rows.filter(col("v").isNotNull)
          .select(size(col("v")).as("d"))
          .limit(1024).agg(org.apache.spark.sql.functions.max(col("d")))
          .collect()(0)
        // an all-null sample leaves nothing to size — the build below
        // will surface the null vectors itself; skip the guard
        val dims = if (dimSample.isNullAt(0)) 0 else dimSample.getInt(0)
        val perVec = if (dims > 0) bytesPerVector(dims, m) else 0L
        val perShard = (n + shards - 1) / shards
        val est = perShard * perVec
        if (est > maxShardBytes) {
          // vectors that fit one shard's budget; the suggestion must
          // itself pass the ceil(n/shards) check above
          val fitPerShard = maxShardBytes / perVec
          require(fitPerShard > 0,
            s"a single vector (~$perVec B at $dims dims) exceeds the " +
              s"$maxShardBytes B shard budget — raise maxShardBytes")
          val suggest = (n + fitPerShard - 1) / fitPerShard
          throw new IllegalArgumentException(
            s"HNSW shard budget exceeded: ~$perShard vectors/shard x " +
              s"$perVec B/vector = $est B > $maxShardBytes B budget. " +
              s"Use shards >= $suggest (or raise maxShardBytes if the " +
              "executors have the memory)")
        }
      }
    }
    rows
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
        val baseG = Option(graphBytes).map(deserialize)
        // same-vector invariant: a re-appended id must carry the SAME
        // vector — the probe path dedups duplicate (query, neighbor)
        // rows via dense_rank over EXACT cosine ties, which only holds
        // when every copy of an id scores identically. An id arriving
        // with a changed vector would silently gap ranks downstream;
        // refuse it loudly here instead (update = delete + re-add).
        baseG.foreach { g =>
          val pos = g.ids.zipWithIndex.toMap
          incoming.foreach { case (id, v) =>
            pos.get(id).foreach { i =>
              require(java.util.Arrays.equals(g.vecs(i), v),
                s"id $id re-appended to shard $shard with a different " +
                  "vector — duplicate copies must tie exactly for the " +
                  "probe-side dedup; delete and rebuild to update a vector")
            }
          }
        }
        val g = insertAll(baseG, incoming.toArray, m, efConstruction)
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

  /** Serialization/layout format version, written into the
    * `_graft_hnsw_format` marker INSIDE each published version subdir:
    * a reused index dir from an OLDER build whose graph codec or
    * layout differs must rebuild, never deserialize garbage
    * ([[Similarity.marginMiningAnn]]'s `reuseIndexes` checks it;
    * [[probeStreaming]] and [[loadShardedIndex]] REQUIRE it). Bump
    * when [[serialize]] or the layout changes shape.
    *
    * Layout (format 2 — versioned publish): `dir/_graft_hnsw_current`
    * names the live version subdir (`v-<n>`); the subdir holds the
    * shard files plus the marker, whose first line is the format
    * version and whose second line is the MANIFEST — the space-
    * separated ids of the shards that exist. Publication order is
    * write-everything-then-swap-pointer, so a probe racing a re-save
    * resolves either the old COMPLETE layout or (if the old subdir
    * was already reclaimed under it) fails loudly on a manifest-listed
    * shard file — never a silent partial top-k. A manifest miss =
    * legitimately empty shard; a manifest HIT with a missing file =
    * corruption, refused loudly.
    */
  private[ops] val FormatVersion = "2"
  private[ops] val FormatMarker = "_graft_hnsw_format"
  private[ops] val CurrentPointer = "_graft_hnsw_current"

  /** Resolve the live version subdir of a [[saveShardedIndex]] layout:
    * (subdir path, manifest of present shard ids). Every failure mode
    * is LOUD and names the path — a missing root, a missing pointer
    * (pre-versioned or half-published layout), a missing subdir (probe
    * raced a re-save past its reclaim), a missing or version-
    * mismatched marker. Silent-empty is never an option: the repo rule
    * is that a missing path reads loudly.
    */
  private[ops] def resolveCurrent(dir: String,
      conf: org.apache.hadoop.conf.Configuration)
      : (org.apache.hadoop.fs.Path, Set[Int]) = {
    val dp = new org.apache.hadoop.fs.Path(dir)
    val fs = dp.getFileSystem(conf)
    require(fs.exists(dp), s"no HNSW index at $dir — build and " +
      "saveShardedIndex first (a typo'd or deleted side channel must " +
      "not probe as empty)")
    val ptr = new org.apache.hadoop.fs.Path(dp, CurrentPointer)
    require(fs.exists(ptr), s"$dir has no $CurrentPointer pointer — " +
      "not a published index layout (or a pre-format-2 layout): " +
      "re-save with the current saveShardedIndex")
    val sub = {
      val in = fs.open(ptr)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
    val sp = new org.apache.hadoop.fs.Path(dp, sub)
    require(fs.exists(sp), s"$dir points at version subdir $sub which " +
      "does not exist — a probe raced a re-save past its reclaim, or " +
      "the side channel is corrupted; retry or re-save")
    val mp = new org.apache.hadoop.fs.Path(sp, FormatMarker)
    require(fs.exists(mp), s"$sp has no $FormatMarker marker — " +
      "half-published or corrupted index layout")
    val lines = {
      val in = fs.open(mp)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    val ver = lines.headOption.getOrElse("").trim
    require(ver == FormatVersion,
      s"index at $sp has format '$ver' but this build reads format " +
        s"'$FormatVersion' — rebuild the index with this version")
    val manifest = lines.drop(1).headOption.getOrElse("").trim match {
      case "" => Set.empty[Int]
      case s => s.split(' ').map(_.toInt).toSet
    }
    (sp, manifest)
  }

  /** True iff `dir` holds a complete, current-format index layout —
    * the reuse gate [[Similarity.marginMiningAnn]] checks before
    * skipping a rebuild (quiet by design: "not ready" means rebuild,
    * not fail). Completeness includes EVERY manifest-listed shard
    * file existing: a marker-intact layout whose shard files were
    * deleted out-of-band must rebuild here, not crash the probe
    * mid-job later.
    */
  private[ops] def indexReady(dir: String,
      conf: org.apache.hadoop.conf.Configuration): Boolean =
    scala.util.Try {
      val (sub, manifest) = resolveCurrent(dir, conf)
      val fs = sub.getFileSystem(conf)
      manifest.forall(s =>
        fs.exists(new org.apache.hadoop.fs.Path(sub, f"shard-$s%05d.bin")))
    }.getOrElse(false)

  /** Publish the index ATOMICALLY against concurrent probes: shard
    * files and marker are written COMPLETE into a fresh `v-<n>` subdir
    * first, then the `_graft_hnsw_current` pointer swings to it, then
    * stale subdirs (and any pre-format-2 flat files) are reclaimed. A
    * probe that resolved the pointer before the swap reads the old
    * complete layout while it exists and fails LOUDLY (manifest-listed
    * shard missing) if the reclaim won the race — the commit-log
    * publish pattern the rest of the repo uses; silent partial top-k
    * is impossible by construction.
    *
    * WRITER CONTRACT: one saver at a time per `dir`. Each save writes
    * into a subdir uniquified with a random suffix, so two concurrent
    * saves can never interleave shard files in ONE subdir (each
    * publishes a complete layout; the last pointer swap wins). Each
    * reclaim RE-READS the pointer just before deleting and spares the
    * subdir it names, so a racing saver's winning layout survives the
    * loser's cleanup; only a pointer swap landing INSIDE the re-read →
    * delete window can still orphan the pointer, which the next probe
    * reports LOUDLY (missing subdir) — an availability break, never a
    * silent partial read. Concurrent saves remain wasteful: coordinate
    * re-saves externally (the reuse gate in
    * [[Similarity.marginMiningAnn]] already serializes per-session).
    */
  def saveShardedIndex(index: DataFrame, dir: String,
      fsConf: Map[String, String] = Map.empty): Unit = {
    val spark = index.sparkSession
    import spark.implicits._
    val conf = sessionFsOverrides(spark) ++ fsConf
    val dp = new org.apache.hadoop.fs.Path(dir)
    val fsD = dp.getFileSystem(taskConf(conf))
    // next monotonic version: the old layout stays live (and readable
    // by in-flight probes, including the load → append → save-in-place
    // flow whose input plan reads the CURRENT subdir) until the swap
    val prior: Seq[String] =
      if (!fsD.exists(dp)) Nil
      else fsD.listStatus(dp).toSeq.map(_.getPath.getName)
    val nextN = prior.filter(_.matches("v-[0-9]+(-[0-9a-f]+)?"))
      .map(_.stripPrefix("v-").takeWhile(_.isDigit).toInt)
      .foldLeft(0)(math.max) + 1
    // random uniquifier: two concurrent saves that both computed this
    // nextN land in DIFFERENT subdirs — complete layouts either way,
    // never interleaved shard files under one marker
    val sub = f"v-$nextN%08d-${java.util.UUID.randomUUID().toString.take(8)}"
    val sp = new org.apache.hadoop.fs.Path(dp, sub)
    // pin the rows: the manifest collect and the shard write must see
    // the same build exactly once (an unpersisted fresh build would
    // run its expensive mapPartitions twice)
    val rows = index.select(col("shard").cast("int"), col("graph"))
      .as[(Int, Array[Byte])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val manifest = rows.map(_._1).collect().sorted
    val subS = sp.toString
    rows.foreachPartition { it: Iterator[(Int, Array[Byte])] =>
      it.foreach { case (s, bytes) =>
        val p = new org.apache.hadoop.fs.Path(subS, f"shard-$s%05d.bin")
        val fs = p.getFileSystem(taskConf(conf))
        val out = fs.create(p, true)
        try out.write(bytes) finally out.close()
      }
    }
    rows.unpersist(false)
    val mk = fsD.create(new org.apache.hadoop.fs.Path(sp, FormatMarker), true)
    try mk.write(
      s"$FormatVersion\n${manifest.mkString(" ")}\n".getBytes("UTF-8"))
    finally mk.close()
    // pointer swap: write-temp + rename (rename is the closest-to-
    // atomic primitive shared by HDFS/local/object-store FS contracts;
    // the delete-before-rename window resolves to a LOUD missing-
    // pointer error on a racing probe, never a silent empty)
    val ptr = new org.apache.hadoop.fs.Path(dp, CurrentPointer)
    val tmp = new org.apache.hadoop.fs.Path(dp, s"$CurrentPointer.tmp")
    val pt = fsD.create(tmp, true)
    try pt.write(s"$sub\n".getBytes("UTF-8")) finally pt.close()
    if (fsD.exists(ptr)) fsD.delete(ptr, false)
    require(fsD.rename(tmp, ptr),
      s"failed to publish $ptr — pointer swap rename refused")
    // reclaim stale layouts: older version subdirs and any
    // pre-format-2 flat shard files/marker. The pointer is RE-READ
    // here: a concurrent saver that published before our listing and
    // swapped after our swap has made ITS subdir current — deleting it
    // would leave the live pointer dangling (a loud failure on the
    // next probe, but an availability break). Skipping whatever the
    // pointer names now keeps the winner's layout alive; the loser's
    // subdir becomes the stale one the NEXT save reclaims.
    val currentNow =
      try {
        val in = fsD.open(ptr)
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toList.headOption.map(_.trim).getOrElse(sub)
        finally in.close()
      } catch { case _: java.io.IOException => sub }
    prior.foreach { n =>
      if ((n.matches("v-[0-9]+(-[0-9a-f]+)?") && n != sub &&
        n != currentNow) ||
        n.matches("shard-[0-9]+[.]bin") || n == FormatMarker)
        fsD.delete(new org.apache.hadoop.fs.Path(dp, n), true)
    }
  }

  /** Read a [[saveShardedIndex]] side-channel layout back into the
    * (shard, n, graph) DataFrame shape the build/append APIs speak —
    * the round trip behind incremental re-mining: load, append the
    * new vectors ([[appendToShardedIndex]] touches only their
    * shards), save. One binaryFile row per shard; `n` recomputes from
    * the graph (executor-side, no driver deserialization).
    */
  def loadShardedIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, fsConf: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val conf = taskConf(sessionFsOverrides(spark) ++ fsConf)
    val (sub, manifest) = resolveCurrent(dir, conf)
    // the loaded set must BE the manifest: a listed-but-absent shard
    // loaded silently would flow through the append → save round trip
    // and republish a valid-LOOKING layout that permanently dropped
    // the missing shard's vectors; an unlisted extra file is equally
    // a torn layout. Same loudness rule as the probe.
    val present = sub.getFileSystem(conf).listStatus(sub)
      .map(_.getPath.getName)
      .collect { case n if n.matches("shard-[0-9]+[.]bin") =>
        n.stripPrefix("shard-").stripSuffix(".bin").toInt
      }.toSet
    require(present == manifest,
      s"index layout at $sub is torn: manifest lists shards " +
        s"${manifest.toSeq.sorted.mkString(",")} but the dir holds " +
        s"${present.toSeq.sorted.mkString(",")} — concurrent re-save " +
        "or out-of-band damage; re-save or rebuild before loading")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "shard-*.bin").load(sub.toString)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val shard = p.substring(p.lastIndexOf("shard-") + 6,
          p.lastIndexOf(".bin")).toInt
        (shard, deserialize(bytes).ids.length.toLong, bytes)
      }
      .toDF("shard", "n", "graph")
  }

  /** Task-side shard read against a RESOLVED version subdir. The
    * manifest decides what absence means: an unlisted shard is
    * legitimately empty (None); a LISTED shard whose file is gone is
    * corruption or a lost re-save race and throws, naming the path —
    * a partial top-k must never look like an answer.
    */
  private def loadShard(subDir: String, shard: Int, manifest: Set[Int],
      fsConf: Map[String, String]): Option[ShardGraph] = {
    if (!manifest.contains(shard)) return None
    val p = new org.apache.hadoop.fs.Path(subDir, f"shard-$shard%05d.bin")
    val fs = p.getFileSystem(taskConf(fsConf))
    if (!fs.exists(p))
      throw new IllegalStateException(
        s"HNSW index layout at $subDir lists shard $shard in its " +
          s"manifest but $p is missing — concurrent re-save reclaimed " +
          "it mid-probe, or the side channel is corrupted; retry the " +
          "probe (it will resolve the new layout) or re-save")
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue,
      s"shard file $p is $len bytes (> 2 GiB) — the byte-array codec " +
        "cannot represent it; rebuild with more shards")
    val in = fs.open(p)
    try {
      val bytes = new Array[Byte](len.toInt)
      in.readFully(bytes)
      Some(deserialize(bytes))
    } finally in.close()
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
    // resolve the live layout ONCE, driver-side, with the SAME conf
    // resolution the tasks use (a custom-conf deployment must not pass
    // the driver check where tasks would fail, or vice versa) — every
    // task then reads this consistent snapshot. A missing dir, missing
    // pointer or wrong-format marker refuses loudly here.
    val (sub, manifest) = resolveCurrent(indexDir, taskConf(conf))
    // a shards argument below the layout's manifest would silently
    // skip whole shards — refuse loudly instead
    require(manifest.forall(_ < shards),
      s"index at $indexDir holds shard ${manifest.max} but the probe " +
        s"was asked for $shards shards — whole shards would be " +
        "silently skipped; pass the layout's own shard count")
    val subS = sub.toString
    // PARTITION-ID packing: hash repartition on shard id packs two
    // shards into one task while another idles (balls-in-bins at small
    // shard counts) — an identity partitioner guarantees task i serves
    // EXACTLY shard i, so effective parallelism is the full shard
    // count and each graph loads exactly once per probe
    val fanned = queries
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"))
      .withColumn("shard", explode(sequence(lit(0), lit(shards - 1))))
      .select($"shard", $"id", $"v")
      .as[(Int, Long, Array[Float])]
      .rdd
      .map { case (s, qid, qv) => (s, (qid, qv)) }
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = shards
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
    val probed = fanned.mapPartitions { it =>
      var cached = -1
      var g: Option[ShardGraph] = None
      it.flatMap { case (s, (qid, qv)) =>
        if (s != cached) { cached = s; g = loadShard(subS, s, manifest, conf) }
        g.iterator.flatMap { graph =>
          val kk = if (excludeSelf) k + 1 else k
          graph.search(qv, kk, ef).iterator
            .filter { case (nid, _) => !excludeSelf || nid != qid }
            .take(k)
            .map { case (nid, sc) => (qid, nid, sc) }
        }
      }
    }
    // ONE exchange instead of dedup-then-window: duplicate (query,
    // neighbor) occurrences tie exactly in (cosine, neighbor_id) — the
    // same id always carries the same vector — so dense_rank equals
    // row_number over the deduped rows; dedup runs on the ≤ k·shards
    // survivors only
    val raw = spark.createDataset(probed)
      .toDF("query_id", "neighbor_id", "cosine")
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id")
    raw.withColumn("rank", dense_rank().over(w).cast("long"))
      .filter($"rank" <= k)
      .dropDuplicates("query_id", "neighbor_id")
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
    // without dedup a neighbor could hold two top-k slots — match
    // Similarity.bruteForceTopK's dropDuplicates output contract.
    // Copies of one id carry the same vector, so duplicate rows tie
    // EXACTLY in (cosine, neighbor_id): dense_rank equals row_number
    // over the deduped rows, and the residual dropDuplicates runs on
    // the ≤ k·dup survivors — one candidate-volume exchange, not two
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id")
    raw.withColumn("rank", dense_rank().over(w).cast("long"))
      .filter($"rank" <= k)
      .dropDuplicates("query_id", "neighbor_id")
      .select($"query_id", $"rank", $"neighbor_id", $"cosine")
  }
}
