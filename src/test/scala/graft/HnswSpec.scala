package graft

import graft.ops.{Hnsw, Similarity}

/** Sharded HNSW graph index ([[graft.ops.Hnsw]]): recall against the
  * exact brute force, deterministic rebuilds, and the parquet
  * round-trip of the materialized index rows.
  */
class HnswSpec extends SparkSpec {

  private val k = 10
  private lazy val corpus = Tables.table(spark, sf01, "embeddings")
  private lazy val queries = corpus.filter("vec_id < 25")

  private def neighborSets(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Set[Long]] =
    df.collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("recall@10 vs brute force stays high across shard merges") {
    val index = Hnsw.buildShardedIndex(corpus, "vec_id", "embedding",
      shards = 4, m = 8, efConstruction = 64)
    val got = neighborSets(
      Hnsw.probe(index, queries, "vec_id", "embedding", k, ef = 96))
    val want = neighborSets(
      Similarity.bruteForceTopK(queries, corpus, "embedding", "vec_id", k))
    assert(got.keySet == want.keySet)
    val recalls = want.map { case (q, ws) =>
      (got(q) & ws).size.toDouble / ws.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, f"mean recall@10 $mean%.3f below 0.9")
    // every neighbor list is exactly k long (the merge never starves)
    assert(got.values.forall(_.size == k))
  }

  test("builds are deterministic: two independent indexes probe identically") {
    def run() = {
      val idx = Hnsw.buildShardedIndex(corpus, "vec_id", "embedding",
        shards = 4, m = 8, efConstruction = 64)
      Hnsw.probe(idx, queries, "vec_id", "embedding", k, ef = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
    }
    assert(run() == run(), "rebuild must reproduce the same top-k")
  }

  test("the index is plain data: parquet round-trip probes identically") {
    val dir = java.nio.file.Files.createTempDirectory("hnsw-idx").toString
    val idx = Hnsw.buildShardedIndex(corpus, "vec_id", "embedding",
      shards = 4, m = 8, efConstruction = 64)
    idx.write.mode("overwrite").parquet(dir)
    val direct = neighborSets(
      Hnsw.probe(idx, queries, "vec_id", "embedding", k, ef = 64))
    val reloaded = neighborSets(Hnsw.probe(spark.read.parquet(dir),
      queries, "vec_id", "embedding", k, ef = 64))
    assert(direct == reloaded)
  }

  test("incremental append: recall parity with the grown corpus, appended ids retrievable") {
    val base = corpus.filter("vec_id < 400")
    val extra = corpus.filter("vec_id >= 400")
    val idx = Hnsw.buildShardedIndex(base, "vec_id", "embedding",
      shards = 4, m = 8, efConstruction = 64)
    val grown = Hnsw.appendToShardedIndex(idx, extra, "vec_id", "embedding",
      shards = 4, m = 8, efConstruction = 64)
    // every vector is in exactly one shard afterwards
    assert(grown.agg(org.apache.spark.sql.functions.sum("n")).head.getLong(0)
      == corpus.count())
    val got = neighborSets(
      Hnsw.probe(grown, queries, "vec_id", "embedding", k, ef = 96))
    val want = neighborSets(
      Similarity.bruteForceTopK(queries, corpus, "embedding", "vec_id", k))
    val recalls = want.map { case (q, ws) => (got(q) & ws).size.toDouble / ws.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.85, f"post-append mean recall@10 $mean%.3f below 0.85")
    // appended vectors are first-class: wherever brute force ranks an
    // appended id into a top-10, the grown index can find appended ids
    if (want.values.exists(_.exists(_ >= 400L)))
      assert(got.values.exists(_.exists(_ >= 400L)),
        "appended ids never surface although brute force ranks them")
    // appending twice from the same inputs reproduces the same answers
    val grown2 = Hnsw.appendToShardedIndex(idx, extra, "vec_id", "embedding",
      shards = 4, m = 8, efConstruction = 64)
    assert(neighborSets(Hnsw.probe(grown2, queries, "vec_id", "embedding",
      k, ef = 96)) == got)
  }

  test("incremental append touches only the routed shards — the rest pass through byte-identical") {
    val base = corpus.filter("vec_id < 499")
    val one = corpus.filter("vec_id = 499")
    val idx = Hnsw.buildShardedIndex(base, "vec_id", "embedding",
      shards = 8, m = 8, efConstruction = 64).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getAs[Array[Byte]](2))).toMap
    val idxDf = {
      import spark.implicits._
      idx.toSeq.map { case (s, (n, g)) => (s, n, g) }.toDF("shard", "n", "graph")
    }
    val grown = Hnsw.appendToShardedIndex(idxDf, one, "vec_id", "embedding",
      shards = 8, m = 8, efConstruction = 64).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getAs[Array[Byte]](2))).toMap
    val touched = grown.filter { case (s, (n, _)) => n != idx.get(s).map(_._1).getOrElse(0L) }
    assert(touched.size == 1, s"one new vector must touch one shard: ${touched.keySet}")
    (grown.keySet - touched.keySet.head).foreach { s =>
      assert(java.util.Arrays.equals(grown(s)._2, idx(s)._2),
        s"untouched shard $s must pass through byte-identical")
    }
  }

  test("re-appending an existing id with a DIFFERENT vector refuses loudly") {
    import org.apache.spark.sql.functions._
    val idx = Hnsw.buildShardedIndex(corpus, "vec_id", "embedding",
      shards = 4, m = 8, efConstruction = 64)
    // perturb one existing id's vector — the same-vector invariant the
    // probe-side dense_rank dedup relies on must be enforced at append
    val changed = corpus.filter("vec_id = 7")
      .withColumn("embedding", transform(col("embedding"), x => x + lit(1.0f)))
    val e = intercept[org.apache.spark.SparkException] {
      Hnsw.appendToShardedIndex(idx, changed, "vec_id", "embedding",
        shards = 4, m = 8, efConstruction = 64).collect()
    }
    assert(e.getMessage.contains("different") ||
      Option(e.getCause).exists(_.getMessage.contains("different")))
  }

  test("probe dedups duplicate ids: re-appending an existing id never yields two top-k slots") {
    val idx = Hnsw.buildShardedIndex(corpus, "vec_id", "embedding",
      shards = 4, m = 8, efConstruction = 64)
    // re-insert ids that already live in the index — the append routes
    // by hash and lands copies next to (or apart from) the originals
    val grown = Hnsw.appendToShardedIndex(idx,
      corpus.filter("vec_id < 50"), "vec_id", "embedding",
      shards = 4, m = 8, efConstruction = 64)
    val rows = Hnsw.probe(grown, queries, "vec_id", "embedding", k, ef = 96)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    assert(rows.length == rows.distinct.length,
      "a (query, neighbor) pair occupied more than one top-k slot")
    // ranks stay dense 1..k per query after the dedup
    rows.groupBy(_._1).values.foreach(g => assert(g.length == k))
  }

  // ---------------------------------------------------- side channel

  private def currentSubdir(dir: String): java.io.File = {
    val ptr = new java.io.File(dir, "_graft_hnsw_current")
    new java.io.File(dir,
      new String(java.nio.file.Files.readAllBytes(ptr.toPath), "UTF-8").trim)
  }

  test("probeStreaming refuses a missing index dir loudly, naming the path") {
    val ghost = new java.io.File(
      java.nio.file.Files.createTempDirectory("hnsw-none").toFile,
      "never-saved").toString
    val e = intercept[IllegalArgumentException] {
      Hnsw.probeStreaming(queries, ghost, 4, "vec_id", "embedding", k)
    }
    assert(e.getMessage.contains(ghost),
      s"the refusal must name the missing path: ${e.getMessage}")
  }

  test("probeStreaming refuses a dir without the published pointer/marker") {
    val dir = java.nio.file.Files.createTempDirectory("hnsw-bare").toString
    // dir exists but holds no published layout (e.g. a typo'd path that
    // happens to exist, or a crashed pre-format save)
    val e = intercept[IllegalArgumentException] {
      Hnsw.probeStreaming(queries, dir, 4, "vec_id", "embedding", k)
    }
    assert(e.getMessage.contains("_graft_hnsw_current"),
      s"must refuse on the missing pointer: ${e.getMessage}")
    // a stale FORMAT marker inside the version subdir refuses too
    val idx = Hnsw.buildShardedIndex(corpus, "vec_id", "embedding",
      shards = 4, m = 8, efConstruction = 64)
    Hnsw.saveShardedIndex(idx, dir)
    val marker = new java.io.File(currentSubdir(dir), "_graft_hnsw_format")
    java.nio.file.Files.write(marker.toPath, "0\n0 1 2 3\n".getBytes("UTF-8"))
    new java.io.File(currentSubdir(dir),
      "._graft_hnsw_format.crc").delete()
    val e2 = intercept[IllegalArgumentException] {
      Hnsw.probeStreaming(queries, dir, 4, "vec_id", "embedding", k)
    }
    assert(e2.getMessage.contains("format"),
      s"must refuse on a format mismatch: ${e2.getMessage}")
  }

  test("a manifest-listed shard file gone missing fails the probe loudly — never a silent partial top-k") {
    val dir = java.nio.file.Files.createTempDirectory("hnsw-torn").toString
    val idx = Hnsw.buildShardedIndex(corpus, "vec_id", "embedding",
      shards = 4, m = 8, efConstruction = 64)
    Hnsw.saveShardedIndex(idx, dir)
    val victim = new java.io.File(currentSubdir(dir), "shard-00002.bin")
    assert(victim.isFile)
    victim.delete()
    new java.io.File(currentSubdir(dir), ".shard-00002.bin.crc").delete()
    val e = intercept[org.apache.spark.SparkException] {
      Hnsw.probeStreaming(queries, dir, 4, "vec_id", "embedding", k)
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.isInstanceOf[IllegalStateException] &&
        c.getMessage.contains("shard-00002.bin")),
      s"the task failure must name the torn shard file: ${e.getMessage}")
    // loadShardedIndex must refuse the same torn layout — loading it
    // silently would flow through append → save and republish a
    // valid-looking layout that permanently dropped shard 2's vectors
    val eL = intercept[IllegalArgumentException] {
      Hnsw.loadShardedIndex(spark, dir)
    }
    assert(eL.getMessage.contains("torn"), eL.getMessage)
  }

  test("re-save publishes atomically: pointer swings to a complete new layout, stale subdirs reclaimed, probes keep answering") {
    val dir = java.nio.file.Files.createTempDirectory("hnsw-swap").toString
    val idx = Hnsw.buildShardedIndex(corpus, "vec_id", "embedding",
      shards = 4, m = 8, efConstruction = 64)
    Hnsw.saveShardedIndex(idx, dir)
    val firstSub = currentSubdir(dir).getName
    val before = neighborSets(Hnsw.probeStreaming(queries, dir, 4,
      "vec_id", "embedding", k, ef = 96))
    // re-save (the append → save-in-place flow reads the CURRENT
    // layout while writing the next — the old subdir must stay intact
    // until the swap)
    Hnsw.saveShardedIndex(Hnsw.loadShardedIndex(spark, dir), dir)
    val secondSub = currentSubdir(dir).getName
    assert(secondSub != firstSub, "re-save must publish a NEW version subdir")
    assert(!new java.io.File(dir, firstSub).exists(),
      "the stale version subdir must be reclaimed after the swap")
    val after = neighborSets(Hnsw.probeStreaming(queries, dir, 4,
      "vec_id", "embedding", k, ef = 96))
    assert(after == before, "a re-save of the same index must answer identically")
  }

  test("probeStreaming packs one shard per task — no balls-in-bins collision caps parallelism") {
    val dir = java.nio.file.Files.createTempDirectory("hnsw-pack").toString
    val shards = 6
    Hnsw.saveShardedIndex(Hnsw.buildShardedIndex(corpus, "vec_id",
      "embedding", shards = shards, m = 8, efConstruction = 64), dir)
    // count distinct shards served per task by instrumenting the same
    // fan-out the probe uses: identity partitioning on the shard id
    // must put exactly one shard's stream in each partition
    import spark.implicits._
    val perPartition = queries
      .select(org.apache.spark.sql.functions.col("vec_id").cast("long"),
        org.apache.spark.sql.functions.col("embedding"))
      .as[(Long, Array[Float])]
      .rdd
      .flatMap { case (id, v) => (0 until shards).map(s => (s, (id, v))) }
      .partitionBy(new org.apache.spark.Partitioner {
        def numPartitions: Int = shards
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .mapPartitionsWithIndex { (pid, it) =>
        Iterator.single(pid -> it.map(_._1).toSet)
      }
      .collect().toMap
    perPartition.foreach { case (pid, served) =>
      assert(served.subsetOf(Set(pid)),
        s"partition $pid serves shards $served — must serve exactly itself")
    }
    assert(perPartition.values.count(_.nonEmpty) == shards,
      "every shard must land in its own task")
    // and the end-to-end probe over that layout stays correct
    val got = neighborSets(Hnsw.probeStreaming(queries, dir, shards,
      "vec_id", "embedding", k, ef = 96))
    val want = neighborSets(
      Similarity.bruteForceTopK(queries, corpus, "embedding", "vec_id", k))
    val recalls = want.map { case (q, ws) => (got(q) & ws).size.toDouble / ws.size }
    assert(recalls.sum / recalls.size >= 0.9)
  }

  test("buildShardedIndex pre-flight refuses an under-sharded build, naming the shard count that fits") {
    // 500 vectors x 64 dims ≈ (256 + 128 + 96) B each; a 10 KiB budget
    // cannot hold them in 2 shards — the guard must say how many would
    val e = intercept[IllegalArgumentException] {
      Hnsw.buildShardedIndex(corpus, "vec_id", "embedding", shards = 2,
        maxShardBytes = 10240)
    }
    assert(e.getMessage.contains("shards >="),
      s"the refusal must suggest a shard count: ${e.getMessage}")
    val suggested = "shards >= ([0-9]+)".r
      .findFirstMatchIn(e.getMessage).get.group(1).toInt
    // the suggestion must actually fit the budget
    val n = corpus.count()
    val perVec = 4 * 64 + 16 * 8 + 96
    assert((n + suggested - 1) / suggested * perVec <= 10240,
      s"suggested $suggested shards still exceed the budget")
    // maxShardBytes <= 0 skips the guard
    assert(Hnsw.buildShardedIndex(corpus, "vec_id", "embedding",
      shards = 2, maxShardBytes = 0).count() == 2)
  }

  test("level assignment is geometric-ish and reproducible") {
    val ls = (0L until 10000L).map(Hnsw.levelOf(_, 8))
    assert(ls == (0L until 10000L).map(Hnsw.levelOf(_, 8)))
    val l0 = ls.count(_ == 0).toDouble / ls.size
    // P(level 0) = 1 - m^-1 = 0.875 for m=8; allow slack
    assert(l0 > 0.8 && l0 < 0.95, s"P(level0)=$l0")
    assert(ls.max >= 2, "some nodes must reach upper layers")
  }
}
