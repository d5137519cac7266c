package graft

import graft.queries.Text

/** Driver-side ground-truth checks for the round-3 training-pipeline
  * text operators (decontamination, repetition filters, inverted index,
  * BM25, sequence packing). Each test recomputes the expected answer in
  * plain Scala over the sf0.001 corpus (500 docs) — independent of both
  * Spark SQL and the DuckDB oracle.
  */
class TextPipelineSpec extends SparkSpec {

  private lazy val docs: Array[(Long, String, String)] =
    Tables.documents(spark, sf).select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  private def grams8(t: String): Set[String] = {
    val w = t.split(" ")
    if (w.length < 8) Set.empty
    else w.sliding(8).map(_.mkString(" ")).toSet
  }

  test("decontaminate: exactly the train docs sharing an 8-gram with eval") {
    val gs = docs.map { case (id, t, _) => id -> grams8(t) }
    val evalGrams = gs.filter(_._1 % 10 == 0).flatMap(_._2).toSet
    val expected = gs.collect {
      case (id, g) if id % 10 != 0 && g.exists(evalGrams) =>
        id -> g.count(evalGrams).toLong
    }.toMap
    val got = Text.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_shared")).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("gopher repetition: dup-line fraction and top-word ratio exact") {
    val expected: Map[Long, (Double, Double)] = docs.map { case (id, t, _) =>
      val lines = t.split("\\. ", -1)
      val words = t.split(" ")
      val topCnt = words.groupBy(identity).values.map(_.length).max
      id -> (((lines.length - lines.distinct.length).toDouble / lines.length,
        topCnt.toDouble / words.length))
    }.toMap
    val got = Text.gopherRepetition(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Double]("dup_line_frac"), r.getAs[Double]("top_word_ratio"))))
      .toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, (df, tw)) =>
      assert(math.abs(df - expected(id)._1) < 1e-12, s"doc $id dup_line_frac")
      assert(math.abs(tw - expected(id)._2) < 1e-12, s"doc $id top_word_ratio")
    }
  }

  test("inverted index: df and first-10 postings exact") {
    val postings: Map[String, Seq[Long]] = docs
      .flatMap { case (id, t, _) => t.split(" ").distinct.map(_ -> id) }
      .groupBy(_._1).map { case (tok, xs) => tok -> xs.map(_._2).sorted.toSeq }
    val got = Text.invertedIndex(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("df"), r.getString(2)))
    assert(got.length == postings.size)
    got.foreach { case (tok, df, post) =>
      assert(df == postings(tok).length, s"df of $tok")
      assert(post == postings(tok).take(10).mkString(","), s"postings of $tok")
    }
  }

  test("bm25: top-50 ranking matches a driver-side recompute") {
    val terms = Seq("spark", "vector", "merge")
    val n = docs.length.toLong
    val dls = docs.map { case (id, t, _) => id -> t.split(" ").length.toLong }.toMap
    val avgdl = dls.values.sum.toDouble / n
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, t, _) =>
      t.split(" ").filter(terms.contains).groupBy(identity)
        .map { case (w, xs) => (id, w) -> xs.length.toLong }
    }.toMap
    val df = terms.map(w => w -> tf.keys.count(_._2 == w).toLong).toMap
    val scores = tf.toSeq.map { case ((id, w), f) =>
      id -> math.floor(
        math.log((n - df(w) + 0.5) / (df(w) + 0.5) + 1.0) *
          (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dls(id) / avgdl)) * 1e6).toLong
    }.groupBy(_._1).map { case (id, xs) => id -> xs.map(_._2).sum / 1e6 }
    val expected = scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(50)
    val got = Text.bm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getAs[Double]("bm25")))
    assert(got.toSeq == expected)
  }

  test("pack sequences: bins are the running-cumsum chunks per lang") {
    val rows: Seq[(String, Long, Long, Long)] =
      docs.groupBy(_._3).toSeq.flatMap { case (lang, ds) =>
        var cum = 0L
        ds.sortBy(_._1).toSeq.map { case (id, t, _) =>
          val dl = t.split(" ").length.toLong
          val bin = cum / 2048
          cum += dl
          (lang, bin, id, dl)
        }
      }
    val expected = rows.groupBy(x => (x._1, x._2)).map { case ((lang, bin), xs) =>
      (lang, bin) -> ((xs.size.toLong, xs.map(_._4).sum,
        xs.map(_._3).min, xs.map(_._3).max))
    }
    val got = Text.packSequences(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))).toMap
    assert(got == expected)
    // every closed bin is filled past the window boundary's reach:
    // a bin closes only once its cumsum crosses 2048
    got.groupBy(_._1._1).foreach { case (_, bins) =>
      val maxBin = bins.keys.map(_._2).max
      bins.filter(_._1._2 < maxBin).foreach { case ((lang, bin), (_, tot, _, _)) =>
        assert(tot > 0, s"bin ($lang,$bin)")
      }
    }
  }
}
