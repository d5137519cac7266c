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

  test("level assignment is geometric-ish and reproducible") {
    val ls = (0L until 10000L).map(Hnsw.levelOf(_, 8))
    assert(ls == (0L until 10000L).map(Hnsw.levelOf(_, 8)))
    val l0 = ls.count(_ == 0).toDouble / ls.size
    // P(level 0) = 1 - m^-1 = 0.875 for m=8; allow slack
    assert(l0 > 0.8 && l0 < 0.95, s"P(level0)=$l0")
    assert(ls.max >= 2, "some nodes must reach upper layers")
  }
}
