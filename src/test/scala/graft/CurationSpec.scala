package graft

import graft.ops.{Curation, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private val docs = Tables.documents(spark, sf)

  test("curate: every survivor passes the filters; no exact or verified near-dups remain") {
    import spark.implicits._
    val curated = Curation.curate(docs, "text", "doc_id",
      minQuality = 0.3, langs = Seq("en", "de", "fr", "es"), jaccard = 0.8)
      .persist()
    val survivors = curated.select("doc_id").as[Long].collect().toSet
    assert(survivors.nonEmpty)

    // filters hold on every survivor
    val bad = curated.filter(!$"lang_pred".isin("en", "de", "fr", "es") ||
      $"quality" < 0.3)
    assert(bad.isEmpty, "survivor violating filter predicate")

    // no two survivors share a fingerprint
    val n = curated.count()
    val distinctFp = curated
      .select(TextAnalysis.fingerprint($"text").as("fp")).distinct().count()
    assert(distinctFp == n, s"exact dups survived: $n rows, $distinctFp fingerprints")

    // no verified near-dup pair has both endpoints alive
    val cands = Dedup.minhashPairs(curated, "text", "doc_id", threshold = 0.5)
    val verified = Dedup.ngramJaccard(curated, cands, "text", "doc_id")
      .filter($"jaccard" >= 0.8)
    assert(verified.isEmpty,
      "verified near-dup pair with both endpoints surviving")
    curated.unpersist()
  }

  test("curateWithEmbeddings additionally drops semantic near-dups") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .withColumnRenamed("vec_id", "doc_id")
    val textOnly = Curation.curate(docs, "text", "doc_id",
      minQuality = 0.3, langs = Seq("en", "de", "fr", "es"), jaccard = 0.8)
    val withEmb = Curation.curateWithEmbeddings(docs, "text", "doc_id",
      emb, "embedding", "doc_id", cosine = 0.95,
      minQuality = 0.3, langs = Seq("en", "de", "fr", "es"), jaccard = 0.8)
    val tSet = textOnly.select("doc_id").as[Long].collect().toSet
    val eSet = withEmb.select("doc_id").as[Long].collect().toSet
    assert(eSet.subsetOf(tSet), "embedding stage must only remove docs")
    // no embedding near-dup pair survives among the final set
    val survEmb = emb.join(withEmb.select($"doc_id"), Seq("doc_id"), "left_semi")
    val remaining = graft.ops.Dedup.embeddingPairs(survEmb, "embedding",
      "doc_id", threshold = 0.95)
    assert(remaining.isEmpty)
    // the corpus plants embedding perturbation dups — the stage fires
    // when any planted pair survived the text passes; tolerate zero
    // only if the text stages already removed every such doc
    if (eSet == tSet)
      info("embedding stage removed nothing (text passes caught all)")
  }

  test("curateSemantic: the SemDeDup stage drops cluster-bounded semantic near-dups") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
      .withColumnRenamed("vec_id", "doc_id")
      .withColumn("embedding",
        org.apache.spark.sql.functions.transform($"embedding",
          x => x.cast("double")))
    val textOnly = Curation.curate(docs, "text", "doc_id",
      minQuality = 0.3, langs = Seq("en", "de", "fr", "es"), jaccard = 0.8)
    val centroids = graft.ops.Similarity.trainIvfCentroids(
      emb, "embedding", k = 16)
    val semantic = Curation.curateSemantic(docs, "text", "doc_id",
      emb, "embedding", "doc_id", centroids, tau = 0.95,
      minQuality = 0.3, langs = Seq("en", "de", "fr", "es"), jaccard = 0.8)
    val tSet = textOnly.select("doc_id").as[Long].collect().toSet
    val sSet = semantic.select("doc_id").as[Long].collect().toSet
    assert(sSet.subsetOf(tSet), "semantic stage must only remove docs")
    // survivors contain no co-clustered pair above tau (the stage's
    // own contract — within-cluster, min-id representative)
    val survEmb = emb.join(semantic.select($"doc_id"), Seq("doc_id"), "left_semi")
    val verdicts = graft.ops.Similarity.semDedup(
      survEmb, "embedding", "doc_id", centroids, tau = 0.95)
    assert(verdicts.filter(!$"kept").isEmpty,
      "a semantic duplicate pair survived the semantic stage")
  }

  test("curate: stage counters are monotone and near-dedup actually fires") {
    val r = Curation.report(docs, "text", "doc_id",
      minQuality = 0.3, langs = Seq("en", "de", "fr", "es"), jaccard = 0.8)
    assert(r.input >= r.afterFilter)
    assert(r.afterFilter >= r.afterExact)
    assert(r.afterExact >= r.afterNear)
    // the corpus carries planted near-dups (TextDedupSpec ground truth),
    // so the near-dedup stage must remove at least one doc
    assert(r.afterNear < r.afterExact,
      s"near-dedup removed nothing: $r")
    assert(r.afterNear > 0)
  }

  test("pretrainPack: greedy bins match an independent driver-side simulation") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val docs = (0 until 40).map { i =>
      val lang = if (i % 3 == 0) "de" else "en"
      val words = (0 until 5 + rnd.nextInt(60)).map(j => s"w$j").mkString(" ")
      (i.toLong, lang, words)
    }
    val df = docs.toDF("doc_id", "lang_pred", "text")
    val got = Curation.pretrainPack(df, "text", "doc_id", "lang_pred",
      chunkTokens = 16, stride = 12, seqLen = 64).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))

    // independent reimplementation: chunk + greedy pack on the driver
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val chunks = ds.sortBy(_._1).flatMap { case (id, _, text) =>
        val n = text.split(" ").length.toLong
        (0L until n by 12L).map(s => math.min(16L, n - s))
      }
      var cum = 0L
      val bins = chunks.map { c => val b = cum / 64; cum += c; (b, c) }
      bins.groupBy(_._1).map { case (b, cs) =>
        (lang, b, cs.size.toLong, cs.map(_._2).sum)
      }
    }.toSet
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSet == expected,
      s"packing diverged from the reference simulation")
    // greedy bound: a bin overflows by at most one chunk − 1 tokens
    assert(got.forall(_._4 <= 64 + 15), "bin over the greedy bound")
    Dedup.releaseCaches()
  }

  test("fitQualityRidge: the distributed fit matches a driver-side reference solve; the scorer tracks the teacher") {
    val d = 8
    val lambda = 1.0
    val labeled = docs.withColumn("label",
      TextAnalysis.qualityScore(col("text"), col("n_chars")))
    val (w, scorer) = Curation.fitQualityRidge(labeled, "text", "label",
      d = d, lambda = lambda)
    assert(w.length == d)
    // reference: the SAME hashed features (re-expressed here) collected
    // to the driver, normal equations accumulated naively, solved by an
    // INDEPENDENT method (Gauss-Jordan, no pivoting) — the distributed
    // one-pass VectorSumAgg fit must agree to float noise
    val toks = split(TextAnalysis.normalize(col("text")), " ")
    val featExpr = concat(array(lit(1.0)),
      transform(sequence(lit(1), lit(d - 1)), j =>
        size(filter(toks, t =>
          pmod(xxhash64(t), lit(d - 1)) === (j - 1))).cast("double")))
    val rows = labeled.select(featExpr.as("x"), col("label").cast("double"))
      .collect()
      .map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
    val a = Array.ofDim[Double](d, d)
    val b = new Array[Double](d)
    rows.foreach { case (x, y) =>
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { a(i)(j) += x(i) * x(j); j += 1 }
        b(i) += x(i) * y
        i += 1
      }
    }
    var i = 0
    while (i < d) { a(i)(i) += lambda; i += 1 }
    // Gauss-Jordan
    i = 0
    while (i < d) {
      val piv = a(i)(i)
      var c = 0
      while (c < d) { a(i)(c) /= piv; c += 1 }
      b(i) /= piv
      var r = 0
      while (r < d) {
        if (r != i && a(r)(i) != 0.0) {
          val f = a(r)(i)
          var k = 0
          while (k < d) { a(r)(k) -= f * a(i)(k); k += 1 }
          b(r) -= f * b(i)
        }
        r += 1
      }
      i += 1
    }
    val scale = math.max(1.0, b.map(math.abs).max)
    (0 until d).foreach { j =>
      assert(math.abs(w(j) - b(j)) / scale < 1e-8,
        s"weight $j: distributed ${w(j)} vs reference ${b(j)}")
    }
    // the learned score tracks the teacher over the corpus (it is a
    // linear distillation, not the teacher itself)
    val corr = scorer(labeled)
      .agg(org.apache.spark.sql.functions.corr(
        col("learned_quality"), col("label"))).head().getDouble(0)
    assert(corr > 0.4, s"learned score barely correlates with teacher: $corr")
  }

  test("one-pass HashBucketCounts featurizer is bit-identical to the d−1-pass HOF formulation (counts and fitted weights, d=64)") {
    val d = 64
    val lambda = 1.0
    val labeled = docs.withColumn("label",
      TextAnalysis.qualityScore(col("text"), col("n_chars")))
    val toks = split(TextAnalysis.normalize(col("text")), " ")
    // the replaced formulation: one filter pass per bucket
    val hofFeat = concat(array(lit(1.0)),
      transform(sequence(lit(1), lit(d - 1)), j =>
        size(filter(toks, t =>
          pmod(xxhash64(t), lit(d - 1)) === (j - 1))).cast("double")))
    val onePass = concat(array(lit(1.0)),
      graft.functions.HashFunctions.hash_bucket_counts(toks, d - 1))
    // 1) per-row feature vectors identical, element for element
    labeled.select(hofFeat.as("a"), onePass.as("b")).collect().foreach { r =>
      val a = r.getSeq[Double](0); val b = r.getSeq[Double](1)
      assert(a == b, s"feature vectors diverge: $a vs $b")
    }
    // 2) the fitted weights are BIT-identical: same sufficient-stats
    // pass (VectorSumAgg) + same solve, only the featurizer differs
    val hofRow = labeled.select(
      graft.functions.VectorFunctions.vector_sum(
        flatten(transform(hofFeat, xi =>
          transform(hofFeat, xj => xi * xj)))).as("xtx"),
      graft.functions.VectorFunctions.vector_sum(
        transform(hofFeat, xi => xi * col("label").cast("double")))
        .as("xty")).head()
    val wHof = Curation.solveRidge(hofRow.getSeq[Double](0).toArray,
      hofRow.getSeq[Double](1).toArray, d, lambda)
    val (w, _) = Curation.fitQualityRidge(labeled, "text", "label",
      d = d, lambda = lambda)
    (0 until d).foreach { j =>
      assert(java.lang.Double.doubleToRawLongBits(w(j)) ==
        java.lang.Double.doubleToRawLongBits(wHof(j)),
        s"weight $j not bit-identical: ${w(j)} vs ${wHof(j)}")
    }
  }
}
