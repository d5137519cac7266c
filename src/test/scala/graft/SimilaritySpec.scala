package graft

import graft.ops.Similarity
import graft.queries.Vectors
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosine column math: unit vectors, self-similarity 1") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(1.0, 1.0, 0.0)))
      .toDF("id", "v")
    val m = df.select($"id", Similarity.cosine($"v", $"v").as("self")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    m.values.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
    val cross = df.as("a").join(df.as("b"), $"a.id" < $"b.id")
      .select($"a.id", $"b.id", Similarity.cosine($"a.v", $"b.v").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(cross((1L, 2L))) < 1e-12) // orthogonal
    assert(math.abs(cross((1L, 3L)) - math.sqrt(0.5)) < 1e-12)
  }

  test("brute force topk: ranks dense 1..k, cosine descending per query") {
    val rows = Vectors.annBruteForce(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val ranked = rs.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq == (1L to ranked.length))
      val cos = ranked.map(_.getAs[Double]("cosine")).toSeq
      assert(cos == cos.sortBy(-_))
      assert(ranked.forall(r => r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id")))
    }
  }

  test("LSH topk: recall@10 vs brute force is nontrivial, plan broadcasts") {
    val bf = Vectors.annBruteForce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lsh = Vectors.annLsh(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(lsh.nonEmpty)
    // uniform random 64-dim corpus = worst case for LSH (no genuinely
    // close neighbors); multi-table union still has to beat chance.
    // Deterministic (fixed seeds + data) — calibrated from a measured run.
    val recall = bf.intersect(lsh).size.toDouble / bf.size
    info(s"recall@10 = $recall")
    assert(recall > 0.25, s"recall@10 = $recall")
    val plan = physicalPlan(Vectors.annBruteForce(spark, sf))
    assert(plan.contains("Broadcast"))
  }

  test("knn graph: planted twins are top-1, recall vs brute force, no corpus broadcast") {
    import graft.ops.{Dedup, Similarity}
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    // plant a near-identical twin of every 10th vector: the graph's
    // strongest edge for both endpoints must be each other
    val twins = emb.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => x * 1.0001f).as("embedding"),
        $"label")
    val corpus = emb.unionByName(twins)
    val g = Similarity.knnGraph(corpus, "embedding", "vec_id", k = 3,
      planes = 5, tables = 8)
    val top1 = g.filter($"rank" === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    Dedup.releaseCaches()
    val twinIds = emb.filter($"vec_id" % 10 === 0).collect()
      .map(_.getAs[Long]("vec_id"))
    twinIds.foreach { id =>
      assert(top1(id) == id + 100000L, s"twin of $id not its top-1")
      assert(top1(id + 100000L) == id, s"$id not its twin's top-1")
    }
    // recall@3 vs exact graph on the un-planted corpus
    val bf = Similarity.bruteForceTopK(emb, emb, "embedding", "vec_id", k = 3)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.knnGraph(emb, "embedding", "vec_id", k = 3,
      planes = 5, tables = 8).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    Dedup.releaseCaches()
    val recall = bf.intersect(approx).size.toDouble / bf.size
    info(s"knn-graph recall@3 = $recall")
    assert(recall > 0.25, s"recall@3 = $recall")
    // the self-join must be keyed on (table, bucket) — candidate volume
    // bucket-bounded, never all-pairs. (At this tiny SF Spark may still
    // SIZE-broadcast one side; the design constraint is the join key,
    // not the physical strategy, which AQE picks from stats.)
    val plan = physicalPlan(Similarity.knnGraph(emb, "embedding", "vec_id", 3))
    Dedup.releaseCaches()
    val joinLine = plan.linesIterator.find(_.contains("HashJoin")).getOrElse("")
    assert(joinLine.contains("bucket"),
      s"self-join not bucket-keyed: $joinLine")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
  }

  test("md5-plane LSH (oracle path): twin recovery + recall vs brute force") {
    import graft.ops.Dedup
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    // planted twins must be each other's top-1 through the md5 planes
    val twins = emb.filter($"vec_id" % 10 === 0)
      .select(($"vec_id" + 100000L).as("vec_id"),
        transform($"embedding", x => x * 1.0001f).as("embedding"),
        $"label")
    val corpus = emb.unionByName(twins)
    val g = Similarity.knnGraphMd5(corpus, "embedding", "vec_id", k = 3,
      planes = 5, tables = 8)
    val top1 = g.filter($"rank" === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    Dedup.releaseCaches()
    emb.filter($"vec_id" % 10 === 0).collect()
      .map(_.getAs[Long]("vec_id")).foreach { id =>
        assert(top1(id) == id + 100000L, s"twin of $id not its top-1")
      }
    // recall@10 of the md5-plane lshTopK vs brute force on real queries
    val q = emb.filter($"vec_id" < 8)
    val bf = Similarity.bruteForceTopK(q, emb, "embedding", "vec_id", k = 10)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("neighbor_id"))).toSet
    val approx = Similarity.lshTopKMd5(q, emb, "embedding", "vec_id", k = 10,
      planes = 5, tables = 8).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = bf.intersect(approx).size.toDouble / bf.size
    info(s"md5-plane lsh recall@10 = $recall")
    assert(recall > 0.25, s"recall@10 = $recall")
  }

  test("IVF topk: trained centroids, recall vs brute force, probe bound") {
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sf)
    val centroids = Similarity.trainIvfCentroids(emb, "embedding", k = 16, iters = 2)
    assert(centroids.length == 16 && centroids.forall(_.length == 64))
    // training is deterministic
    val again = Similarity.trainIvfCentroids(emb, "embedding", k = 16, iters = 2)
    assert(centroids.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    val bf = Vectors.annBruteForce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // trained-quantizer path (the quality tier)
    import org.apache.spark.sql.functions.col
    val trained = Similarity.ivfTopK(
      Tables.embeddings(spark, sf).filter(col("vec_id") < 8), emb,
      "embedding", "vec_id", k = 10, centroids, nprobe = 4)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val trainedRecall = bf.intersect(trained).size.toDouble / bf.size
    info(s"trained IVF recall@10 = $trainedRecall")
    assert(trainedRecall > 0.25, s"trained recall@10 = $trainedRecall")
    // md5-centroid gate path (the oracle tier)
    val ivf = Vectors.annIvf(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(ivf.nonEmpty)
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    info(s"md5 IVF recall@10 = $recall")
    assert(recall > 0.25, s"recall@10 = $recall")
  }

  test("PQ topk: exact re-rank recall vs brute force, codes compress 8:1 in fields") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val books = graft.ops.Similarity.trainPqCodebooks(emb, "embedding",
      m = 8, k = 16, iters = 2)
    assert(books.length == 8 && books.forall(_.length == 16) &&
      books.forall(_.forall(_.length == 8)), "codebook shape m=8, k=16, sub=8")
    // codes: 8 small ints per vector (vs 64 floats) — the 8:1 field
    // compression that makes the code scan the cheap tier
    val codes = emb.select(graft.ops.Similarity
        .pqEncode(col("embedding"), books).as("codes"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    // shortlist+rerank recall: uniform-random corpus is the worst case;
    // with a 64-deep shortlist over ~1k vectors the exact re-rank must
    // recover well over half of the true top-10 (deterministic: fixed
    // data + seeded training)
    val bf = Vectors.annBruteForce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // trained-codebook path (the quality tier)
    val trained = graft.ops.Similarity.pqTopK(
      emb.filter(col("vec_id") < 8), emb, "embedding", "vec_id",
      k = 10, books, shortlist = 64)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val trainedRecall = bf.intersect(trained).size.toDouble / bf.size
    info(s"trained PQ recall@10 = $trainedRecall")
    assert(trainedRecall > 0.5, s"trained recall@10 = $trainedRecall")
    // md5-codebook gate path (the oracle tier)
    val pq = Vectors.annPq(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = bf.intersect(pq).size.toDouble / bf.size
    info(s"md5 PQ recall@10 = $recall")
    assert(recall > 0.5, s"recall@10 = $recall")
    // re-ranked cosines are EXACT: every reported (pair, cosine) agrees
    // with the brute-force value
    val bfCos = Vectors.annBruteForce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine")).toMap
    Vectors.annPq(spark, sf).collect().foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      bfCos.get(key).foreach { c =>
        assert(math.abs(c - r.getAs[Double]("cosine")) < 1e-12,
          s"re-ranked cosine drifted for $key")
      }
    }
  }

  test("PQ decode reconstructs each subspace's centroid exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val books = graft.ops.Similarity.trainPqCodebooks(emb, "embedding",
      m = 8, k = 16, iters = 1)
    val row = emb.limit(1)
      .select(graft.ops.Similarity.pqEncode(col("embedding"), books).as("codes"))
      .withColumn("recon", graft.ops.Similarity.pqDecode(col("codes"), books))
      .head()
    val codes = row.getSeq[Int](0)
    val recon = row.getSeq[Double](1)
    assert(recon.length == 64)
    codes.zipWithIndex.foreach { case (c, j) =>
      val expect = books(j)(c)
      val got = recon.slice(j * 8, j * 8 + 8)
      assert(got.zip(expect).forall { case (a, b) => math.abs(a - b) < 1e-12 },
        s"subspace $j decoded wrong centroid")
    }
  }

  test("IVF index: build once, probe with partition pruning, same answer as ad-hoc") {
    import graft.ops.Similarity
    val emb = Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val centroids = Similarity.buildIvfIndex(emb, "embedding", "vec_id", dir,
      k = 16, iters = 2)
    // model round-trips exactly
    val loaded = Similarity.loadIvfCentroids(spark, dir)
    assert(loaded.map(_.toSeq).toSeq == centroids.map(_.toSeq).toSeq)

    val queries = emb.orderBy("vec_id").limit(8)
    val probed = Similarity.probeIvfIndex(spark, queries, "embedding",
      "vec_id", dir, k = 10, nprobe = 3)
    val got = probed.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val adhoc = Similarity.ivfTopK(queries, emb, "embedding", "vec_id",
      k = 10, centroids, nprobe = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(got == adhoc, "index probe differs from ad-hoc IVF")

    // the cell scan prunes on the cluster partition column
    val plan = probed.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      plan.linesIterator.filter(_.contains("FileScan")).mkString("\n"))
  }

  test("IVF append: incremental maintenance probes like a whole-built index") {
    import graft.ops.Similarity
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-app").toString
    val centroids = Similarity.buildIvfIndex(half, "embedding", "vec_id", dir,
      k = 16, iters = 2)
    // append the other half: assignment uses the PERSISTED quantizer,
    // no retraining
    Similarity.appendToIvfIndex(spark, rest, "embedding", "vec_id", dir)
    val queries = emb.orderBy("vec_id").limit(8)
    val probed = Similarity.probeIvfIndex(spark, queries, "embedding",
      "vec_id", dir, k = 10, nprobe = 3)
    val got = probed.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    // equivalence oracle: the ad-hoc IVF over the FULL corpus with the
    // same centroids — append must change nothing about the answer
    val whole = Similarity.ivfTopK(queries, emb, "embedding", "vec_id",
      k = 10, centroids, nprobe = 3).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(got == whole, "appended index must probe like a whole-built one")
    // cell pruning still holds after the append (hive layout intact)
    val plan = probed.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") && plan.contains("cluster"),
      plan.linesIterator.filter(_.contains("FileScan")).mkString("\n"))
  }

  test("emb centroids: quantized integer means match a driver recomputation") {
    import spark.implicits._
    val got = graft.queries.Vectors.embCentroids(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("dim")) ->
        r.getAs[Double]("centroid")).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = Tables.embeddings(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")))
      .filter(kv => docs.contains(kv._1))
    val want = vecs.groupBy(kv => docs(kv._1)).flatMap { case (lang, vs) =>
      (0 until 8).map { d =>
        val s = vs.map(v => math.floor(v._2(d).toDouble * 1e6)).sum
        (lang, d) -> s / (vs.length * 1e6)
      }
    }
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(v == want(k), s"$k: $v != ${want(k)}") }
  }

  test("emb quantize: rmse bounded by half-step, extremes saturate") {
    val rows = graft.queries.Vectors.embQuantize(spark, sf).collect()
    assert(rows.length == Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale9")
      val rmse = r.getAs[Double]("rmse9")
      assert(scale > 0)
      // per-element error ≤ scale/2 (floor(x+.5) rounds to nearest)
      assert(rmse >= 0 && rmse <= scale / 2 + 1e-9, s"rmse $rmse scale $scale")
      // the max-|x| element maps to exactly ±127
      assert(r.getAs[Long]("n_sat") >= 1)
    }
  }

  test("semDedup: planted paraphrase-like near-dups are pruned, originals survive, candidates are cluster-bounded") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .withColumn("embedding", transform($"embedding", x => x.cast("double")))
    // paraphrase-like: same meaning direction, small additive drift —
    // every 25th vector re-entered under a fresh id (multiplicative
    // noise would be cosine-invariant and prove nothing)
    val planted = emb.filter($"vec_id" % 25 === 0)
      .withColumn("vec_id", $"vec_id" + 50000)
      .withColumn("embedding", transform($"embedding",
        (x, i) => x + when(i % 5 === 0, lit(0.04)).otherwise(lit(-0.008))))
    val corpus = emb.unionAll(planted)
    val n = corpus.count()
    // TRAINED centroids (the production path; the gate query pins the
    // md5 variant) — same k-means the IVF tier uses
    val centroids = Similarity.trainIvfCentroids(corpus, "embedding", k = 16)
    val out = Similarity.semDedup(corpus, "embedding", "vec_id",
      centroids, tau = 0.95)
    val rows = out.collect()
    assert(rows.length == n)
    val keptSet = rows.filter(_.getAs[Boolean]("kept"))
      .map(_.getAs[Long]("vec_id")).toSet
    val plantedIds = planted.select($"vec_id").collect()
      .map(_.getLong(0)).toSet
    // a planted near-dup is pruned whenever it shares its source's
    // cluster (SemDeDup's stated within-cluster contract); with a
    // tiny additive drift that is nearly always — require most
    val clusterOf = rows.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    val coLocated = plantedIds.filter(p => clusterOf(p) == clusterOf(p - 50000))
    assert(coLocated.nonEmpty, "no planted pair landed in one cluster — test is vacuous")
    assert(coLocated.forall(p => !keptSet(p)),
      s"co-clustered planted dups must be pruned: kept ${coLocated.filter(keptSet)}")
    // min-id survivor: every pruned vector's source stays
    assert(coLocated.forall(p => keptSet(p - 50000)),
      "the lower-id original must survive as the representative")
    // CLUSTER-BOUNDED candidates: the quadratic term is Σ n_i·(n_i−1)/2
    // over cluster sizes, a small fraction of the all-pairs n·(n−1)/2
    val sizes = rows.groupBy(_.getAs[Long]("cluster")).map(_._2.length.toLong)
    val candPairs = sizes.map(s => s * (s - 1) / 2).sum
    val allPairs = n * (n - 1) / 2
    assert(candPairs * 4 < allPairs,
      s"candidate pairs $candPairs not cluster-bounded vs all-pairs $allPairs")
    // and the plan joins on the cluster key — never a cartesian
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"))
  }

  test("autoPlanes encodes the measured production rule: log-growth, clamped, matching the scale curve's good settings") {
    import graft.ops.Similarity.autoPlanes
    // the scale-curve-validated settings (SURVEY §21 knob table)
    assert(autoPlanes(2000) == 5)
    assert(autoPlanes(20000) == 9)
    assert(autoPlanes(60000) == 10)
    // monotone non-decreasing in corpus size
    val seq = Seq(100L, 1000L, 10000L, 100000L, 10000000L,
      1000000000L).map(autoPlanes(_))
    assert(seq == seq.sorted, s"not monotone: $seq")
    // clamps: tiny corpora keep a workable floor, huge ones cap
    assert(autoPlanes(1) == 4)
    assert(autoPlanes(Long.MaxValue / 2) == 24)
    // a bigger target bucket means fewer planes
    assert(autoPlanes(100000, targetBucket = 1024) <
      autoPlanes(100000, targetBucket = 64))
  }

  test("hyperplane bucket is deterministic across invocations") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf).limit(50)
      .withColumn("embedding", transform($"embedding", x => x.cast("double")))
    val b1 = emb.select($"vec_id", Similarity.hyperplaneBucket($"embedding").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = emb.select($"vec_id", Similarity.hyperplaneBucket($"embedding").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
  }
}
