package graft

import graft.queries.Text

/** Driver-side ground-truth recomputation for the corpus-statistics
  * operators added in round 7: exact-substring span REMOVAL,
  * winnowing fingerprints, the self-trained bigram-LM score, and PMI
  * co-occurrence. Each test replays the operator's exact contract in
  * plain Scala over the sf0.001 corpus and compares every row.
  */
class TextCorpusOpsSpec extends SparkSpec {

  private lazy val docs: Seq[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq.sortBy(_._1)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("exact dup spans: stride-1 tier catches misaligned sub-64-char duplicates the 64/16 windows miss") {
    import spark.implicits._
    // a 45-char duplicate planted at offsets 7 and 23 — stride-16
    // 64-char windows never align on it (too short for any window to
    // sit inside it), so dupSpans' detector is blind here by design
    val shared = "THE-QUICK-BROWN-FOX-JUMPS-OVER-THE-LAZY-DOGS!" // 45 chars
    require(shared.length == 45)
    def filler(seed: Int, n: Int): String =
      Iterator.iterate(seed)(x => x * 1103515245 + 12345)
        .map(x => ('a' + math.floorMod(x, 26)).toChar).take(n).mkString
    val d1 = filler(1, 7) + shared + filler(2, 80)
    val d2 = filler(3, 23) + shared + filler(4, 64)
    val d3 = filler(5, 120) // no duplicate content
    val planted = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val exact = Text.exactDupSpansOn(planted).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("dup_chars"))).toMap
    // both carriers report exactly one merged span of exactly 45 chars
    // (stride-1 grams of length 40 cover positions p..p+5 → merged
    // interval [p, p+5+40) = the full 45-char duplicate, no more)
    assert(exact == Map(1L -> (1L, 45L), 2L -> (1L, 45L)),
      s"stride-1 tier must localize the planted 45-char duplicate: $exact")
    // the windowed detector misses it (the documented alignment gap)
    val windowed = Text.dupSpansOn(planted)
    assert(windowed.filter($"n_dup" > 0).count() == 0,
      "64/16 windows should be blind to a misaligned 45-char duplicate " +
        "— if this fires, the exact tier's reason-to-exist changed")
    // the exact EXCISION removes precisely the planted 45 chars and
    // reproduces the documents with the span cut out, byte-exactly
    val removed = Text.exactSpanRemovalOn(planted).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_removed"), r.getAs[String]("cleaned_md5"))).toMap
    assert(removed(1L)._1 == 45L && removed(2L)._1 == 45L && removed(3L)._1 == 0L)
    assert(removed(1L)._2 == md5hex(d1.replace(shared, "")))
    assert(removed(2L)._2 == md5hex(d2.replace(shared, "")))
    assert(removed(3L)._2 == md5hex(d3))
  }

  test("span removal: interval merge and excision match a driver replay") {
    val w = 64; val st = 16
    def starts(t: String): Seq[Int] =
      if (t.length >= w) (0 to (t.length - w) / st).map(_ * st) else Nil
    val spanDocs = docs
      .flatMap { case (id, t) => starts(t).map(s => t.substring(s, s + w) -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expected = docs.map { case (id, t) =>
      val flagged = starts(t).filter(s => spanDocs(t.substring(s, s + w)) >= 2)
      // merge touching/overlapping [s, s+w) intervals
      val merged = flagged.foldLeft(List.empty[(Int, Int)]) {
        case ((ms, me) :: rest, s) if s <= me => (ms, math.max(me, s + w)) :: rest
        case (acc, s) => (s, s + w) :: acc
      }.reverse
      val kept = new StringBuilder
      var p = 0
      merged.foreach { case (s, e) => kept.append(t.substring(p, s)); p = e }
      kept.append(t.substring(p))
      id -> (t.length.toLong, (t.length - kept.length).toLong,
        md5hex(kept.toString))
    }.toMap
    val rows = Text.spanRemoval(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == expected.keySet)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val got = (r.getAs[Long]("n_chars"), r.getAs[Long]("n_removed"),
        r.getAs[String]("cleaned_md5"))
      assert(got == expected(id), s"doc $id: got $got, want ${expected(id)}")
    }
    assert(rows.count(_.getAs[Long]("n_removed") > 0) > 10,
      "the corpus's planted near-dups must lose spans")
  }

  test("winnowing: fingerprint sets match a driver replay") {
    def fps(t: String): Set[String] = {
      val a = t.split(" ")
      if (a.length < 3) return Set.empty
      val hs = (0 to a.length - 3)
        .map(i => md5hex(a.slice(i, i + 3).mkString(" ")))
      if (hs.length < 4) Set.empty
      else (3 until hs.length).map(p => hs.slice(p - 3, p + 1).min).toSet
    }
    val sets = docs.map { case (id, t) => id -> fps(t) }.filter(_._2.nonEmpty)
    val byFp = sets.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val rows = Text.winnowFp(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_fp"), r.getAs[Long]("n_shared"))).toMap
    assert(rows.keySet == sets.map(_._1).toSet)
    sets.foreach { case (id, s) =>
      val want = (s.size.toLong, s.count(byFp(_) >= 2).toLong)
      assert(rows(id) == want, s"doc $id: got ${rows(id)}, want $want")
    }
    // winnowing stores ~2/(w+1) of the grams: spot-check the sampling
    val dense = docs.toMap.apply(sets.head._1).split(" ").length - 2
    assert(sets.head._2.size < dense, "fingerprints must subsample the grams")
  }

  test("bigram LM: per-doc average NLL matches a driver-built LM") {
    val bgs = docs.map { case (id, t) =>
      id -> t.split(" ").toSeq.sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))).toSeq
    }.filter(_._2.nonEmpty)
    val c12 = bgs.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val c1 = c12.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2.toLong).sum).toMap
    def lp(b: (String, String)): Long =
      math.floor(math.log(c12(b).toDouble / c1(b._1)) * 1e6).toLong
    val rows = Text.bigramNll(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_nll"))).toMap
    assert(rows.keySet == bgs.map(_._1).toSet)
    bgs.foreach { case (id, bs) =>
      val want = (bs.size.toLong,
        -bs.map(lp).sum.toDouble / (bs.size * 1e6))
      assert(rows(id) == want, s"doc $id: got ${rows(id)}, want $want")
    }
    // every score is a positive NLL (a probability < 1 somewhere)
    assert(rows.values.forall(_._2 > 0))
  }

  test("PMI co-occurrence: top-100 pairs match a driver replay") {
    val dt = docs.flatMap { case (id, t) =>
      t.split(" ").distinct.map(id -> _)
    }
    val df = dt.groupBy(_._2).view.mapValues(_.size).filter(_._2 >= 25).toMap
    val n = docs.size
    val pairs = docs.flatMap { case (_, t) =>
      val v = t.split(" ").distinct.filter(df.contains).sorted
      for (i <- v.indices; j <- i + 1 until v.length) yield (v(i), v(j))
    }.groupBy(identity).view.mapValues(_.size).filter(_._2 >= 10).toMap
    val scored = pairs.toSeq.map { case ((t1, t2), c12) =>
      (t1, t2, c12.toLong,
        math.floor(math.log(c12.toDouble * n / (df(t1).toLong * df(t2))) * 1e6)
          .toLong)
    }.sortBy(x => (-x._4, x._1, x._2)).take(100)
    val rows = Text.cooccurPmi(spark, sf).collect().map(r =>
      (r.getAs[String]("t1"), r.getAs[String]("t2"),
        r.getAs[Long]("c12"), r.getAs[Long]("pmi_micro"))).toSeq
    assert(rows == scored,
      s"first diff: ${rows.zip(scored).find(p => p._1 != p._2)}")
  }

  test("vocabulary growth: cumulative curves match a driver replay") {
    val perDoc = docs.map { case (id, t) => id -> t.split(" ") }
    val firstDoc = perDoc.flatMap { case (id, ts) => ts.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    var tokCum = 0L; var vocabCum = 0L
    val expected = perDoc.map { case (id, ts) =>
      tokCum += ts.length
      vocabCum += ts.distinct.count(firstDoc(_) == id)
      id -> (tokCum, vocabCum)
    }.toMap
    val rows = Text.vocabGrowth(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("tokens_cum"), r.getAs[Long]("vocab_cum"))).toMap
    assert(rows == expected,
      s"first diff: ${expected.find(kv => rows.get(kv._1) != Some(kv._2))}")
    // Heaps: vocabulary grows sub-linearly — the final vocab is far
    // below the final token count on a natural corpus
    assert(vocabCum < tokCum / 2)
  }

  test("plan hygiene: no UDF, no cartesian; PMI vocabulary broadcasts") {
    Seq(Text.spanRemoval(spark, sf), Text.winnowFp(spark, sf),
      Text.bigramNll(spark, sf), Text.cooccurPmi(spark, sf)).foreach { df =>
      val plan = physicalPlan(df)
      assert(!plan.contains("CartesianProduct"), plan.take(400))
      // the only keyless join allowed is the single-row corpus-size
      // broadcast (PMI's N) — never a data-sized nested loop
      assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 1,
        plan.take(400))
      assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
    }
    // the quadratic pairing's vocabulary filter and the df dictionary
    // lookups ride broadcasts — the corpus side never broadcasts
    val pmi = physicalPlan(Text.cooccurPmi(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(pmi).length >= 3, pmi.take(400))
  }
}
