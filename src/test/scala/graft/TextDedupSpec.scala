package graft

import graft.ops.{Dedup, TextAnalysis => TA}
import graft.queries.Text
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {

  /** Exact word-n-gram Jaccard ground truth, recomputed independently
    * (plain Scala, driver-side) over the sf0.001 corpus (500 docs).
    */
  private lazy val exactJaccard: Map[(Long, Long), Double] = {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def ngrams(t: String): Set[String] = {
      val w = t.trim.toLowerCase.replaceAll("\\s+", " ").split(" ")
      if (w.length < 3) Set(w.mkString(" "))
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> ngrams(t) }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = sa.intersect(sb).size
      if inter > 0
    } yield (ia, ib) -> inter.toDouble / (sa.size + sb.size - inter)).toMap
  }

  private def truePairs(threshold: Double): Set[(Long, Long)] =
    exactJaccard.filter(_._2 >= threshold).keySet

  test("token counts: ws vs bpe relationship and positivity") {
    val rows = Text.tokenCount(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("ws_tokens") > 0)
      // bpe stream splits punctuation out → never fewer tokens than ws
      assert(r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("ws_tokens"))
    }
  }

  test("quality score bounded and sensitive to stopwords") {
    import spark.implicits._
    val rows = Text.quality(spark, sf).collect()
    rows.foreach(r => {
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0 + 1e-9)
    })
    val probe = Seq(
      (1L, "the cat and the dog sat in the house of the king", 46L),
      (2L, "@#$% !!! ??? ++ ~~ || ### $$$ %% ^^", 35L))
      .toDF("doc_id", "text", "n_chars")
    val scored = probe.select($"doc_id",
      TA.qualityScore($"text", $"n_chars").as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) > scored(2L))
  }

  test("langid: marker scoring picks the seeded language") {
    import spark.implicits._
    val probe = Seq(
      (1L, "el perro de la casa que ladra"),
      (2L, "der hund und die katze das ist gut"),
      (3L, "the cat and the dog of the house"),
      (4L, "le chat et les chiens dans est"))
      .toDF("doc_id", "text")
    val out = probe.select($"doc_id", TA.langPredict($"text").as("pred"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "es", 2L -> "de", 3L -> "en", 4L -> "fr"))
  }

  test("fingerprint: whitespace/case-insensitive, content-sensitive") {
    import spark.implicits._
    val probe = Seq(
      (1L, "Hello   World"), (2L, "hello world"), (3L, "hello worlds"))
      .toDF("doc_id", "text")
    val fps = probe.select($"doc_id", TA.fingerprint($"text").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("exact dedup: planted copies dropped, originals kept") {
    val survivors = Text.dedupExact(spark, sf).collect()
    val n = Tables.documents(spark, sf).count()
    assert(survivors.length == n) // all originals, no planted ids
    assert(survivors.forall(_.getAs[Long]("doc_id") < 10000))
  }

  test("minhash LSH: recall 1.0 on ≥0.9-jaccard pairs, no junk below 0.3") {
    val pairs = Text.dedupMinhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    info(s"minhash pairs=${pairs.size}, true(0.9)=${truePairs(0.9).size}")
    assert(pairs.nonEmpty)
    // completeness: every true near-dup pair (jaccard ≥ 0.9) found
    val missed = truePairs(0.9) -- pairs
    assert(missed.isEmpty, s"missed: $missed")
    // precision: nothing reported whose exact jaccard is < 0.3
    pairs.foreach { p =>
      assert(exactJaccard.getOrElse(p, 0.0) >= 0.3,
        s"false positive $p j=${exactJaccard.getOrElse(p, 0.0)}")
    }
  }

  test("minhash est_jaccard tracks exact jaccard on a controlled corpus") {
    import spark.implicits._
    val input = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "a b c d e f g h i j k l m n o p q"), // near dup of 1
      (3L, "z y x w v u t s r q p o n m l k"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(input, "text", "doc_id", threshold = 0.3)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val est = pairs.head.getAs[Double]("est_jaccard")
    // exact word-3-gram jaccard of (1,2) = 14/15
    assert(math.abs(est - 14.0 / 15.0) < 0.25)
  }

  test("simhash: pairs verified by hamming, high-jaccard pairs covered") {
    val rows = Text.dedupSimhash(spark, sf).collect()
    val pairs = rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    info(s"simhash pairs=${pairs.size}")
    assert(rows.forall(_.getAs[Long]("hamming") <= 7))
    assert(pairs.nonEmpty)
    // every reported pair is a genuine textual near-dup
    pairs.foreach { p =>
      assert(exactJaccard.getOrElse(p, 0.0) >= 0.3,
        s"simhash pair $p has jaccard ${exactJaccard.getOrElse(p, 0.0)}")
    }
    // near-identical docs (jaccard ≥ 0.97) must land within the budget
    val missed = truePairs(0.97) -- pairs
    assert(missed.isEmpty, s"missed: $missed")
  }

  test("ngram jaccard: matches the independently computed exact values") {
    val rows = Text.dedupNgramJaccard(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      assert(math.abs(r.getAs[Double]("jaccard") - exactJaccard(p)) < 1e-9,
        s"pair $p: spark=${r.getAs[Double]("jaccard")} exact=${exactJaccard(p)}")
    }
    // completeness against ground truth at the query's 0.8 threshold,
    // candidates from minhash at 0.3 → everything ≥0.8 must surface
    val got = rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val missed = truePairs(0.8) -- got
    assert(missed.isEmpty, s"missed: $missed")
  }

  test("embedding near-dup: exactly the planted perturbations, all found") {
    val rows = Text.dedupEmbedding(spark, sf).collect()
    val pairs = rows.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val vecIds = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val expected = vecIds.map(id => (id, id + 10000))
    assert(pairs == expected,
      s"missing=${expected -- pairs} extra=${pairs -- expected}")
    rows.foreach(r => assert(r.getAs[Double]("cosine") >= 0.95))
  }

  test("dedup_lines: boilerplate sentences removed, order preserved") {
    val rows = graft.queries.Text.dedupLines(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // driver-side ground truth: sentence -> distinct doc count
    val counts = raw.toSeq
      .flatMap { case (id, t) => t.split("\\. ", -1).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2).distinct.size }
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val want = raw(id).split("\\. ", -1).filter(counts(_) <= 2)
      assert(r.getAs[Long]("n_kept") == want.length)
      assert(r.getAs[String]("cleaned") == want.mkString(". "))
    }
    // docs with zero surviving sentences drop out of the result
    val survivors = rows.map(_.getAs[Long]("doc_id")).toSet
    val expectedDocs = raw.collect {
      case (id, t) if t.split("\\. ", -1).exists(counts(_) <= 2) => id
    }.toSet
    assert(survivors == expectedDocs)
  }

  test("group cap: at most 100 per class, deterministic across runs") {
    val a = graft.queries.Text.groupCap(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_sampled"),
        r.getAs[Double]("sum_value")))
    a.foreach { case (_, n, _) => assert(n <= 100) }
    val b = graft.queries.Text.groupCap(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_sampled"),
        r.getAs[Double]("sum_value")))
    assert(a.toSeq == b.toSeq)
  }

  test("pii redact: counts match driver regex, redacted head is clean") {
    val rows = graft.queries.Text.piiRedact(spark, sf).collect()
    val raw = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pat = "\\b(customer|supplier|key)\\b".r
    assert(rows.exists(_.getAs[Long]("n_redacted") > 0))
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_redacted") ==
        pat.findAllIn(raw(id)).length.toLong)
      val head = r.getAs[String]("head60")
      assert(head.length <= 60)
      // no sensitive word survives redaction; ignore the last 8 chars,
      // where the 60-char cut could fabricate a word-final boundary
      assert(!pat.findAllIn(head.dropRight(8)).hasNext)
    }
  }

  test("dup spans: counts match a driver recomputation of the window chain") {
    val rows = Text.dupSpans(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup"))).toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def windows(t: String): Seq[String] =
      if (t.length >= 64)
        (0 to (t.length - 64) / 16).map(i => t.substring(i * 16, i * 16 + 64))
      else Seq(t)
    val spansByDoc = docs.map { case (id, t) => id -> windows(t) }.toMap
    val docsOfSpan = spansByDoc.toSeq
      .flatMap { case (id, ss) => ss.distinct.map(s => s -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    assert(rows.keySet == spansByDoc.keySet)
    spansByDoc.foreach { case (id, ss) =>
      val nDup = ss.count(s => docsOfSpan(s) >= 2)
      assert(rows(id) == (ss.size.toLong, nDup.toLong),
        s"doc $id: got ${rows(id)}, want (${ss.size}, $nDup)")
    }
    // the synthetic corpus's planted near-dups must surface
    assert(rows.values.count(_._2 > 0) > 10,
      "expected duplicated spans across the corpus")
  }
}
