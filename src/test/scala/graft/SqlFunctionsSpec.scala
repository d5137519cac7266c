package graft

import org.apache.spark.sql.functions._

/** The custom expressions exposed through plain SQL — the warehouse
  * user's path (reference README's "data analysts just write SQL").
  */
class SqlFunctionsSpec extends SparkSpec {

  test("graft_* functions callable from spark.sql") {
    GraftExtensions.registerFunctions(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_v")
    val row = spark.sql(
      """SELECT doc_id,
        |  graft_simhash(graft_ngram_hashes(split(lower(text), ' '), 3)) AS sh,
        |  size(graft_minhash(graft_ngram_hashes(split(lower(text), ' '), 3))) AS sig_len
        |FROM docs_v ORDER BY doc_id LIMIT 1""".stripMargin).collect().head
    assert(row.getAs[Long]("sh") != 0L)
    assert(row.getAs[Int]("sig_len") == 64)

    val cos = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val jw = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta') AS j")
      .collect().head.getDouble(0)
    assert(math.abs(jw - 0.9611111111111111) < 1e-15)

    // aggregate path: exact median under capacity
    val med = spark.sql(
      "SELECT graft_quantiles(n_chars, 0.5, 65536)[0] AS m FROM docs_v")
      .collect().head.getDouble(0)
    val exact = spark.sql(
      "SELECT percentile(n_chars, 0.5) AS m FROM docs_v")
      .collect().head.getDouble(0)
    assert(med == exact, s"$med vs $exact")

    // distinct-count sketch: exact below its threshold
    val dd = spark.sql(
      "SELECT graft_distinct(source, 4096) AS d FROM docs_v")
      .collect().head.getLong(0)
    val dexact = spark.sql(
      "SELECT COUNT(DISTINCT source) AS d FROM docs_v")
      .collect().head.getLong(0)
    assert(dd == dexact, s"$dd vs $dexact")
  }

  test("char_gram_hashes is bit-identical to xxhash64(substring) at every position") {
    import spark.implicits._
    import graft.functions.HashFunctions
    // multibyte chars included: the native pass must slice at CHAR
    // boundaries exactly like substring() does, not at byte offsets
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog",
      "ab",                       // shorter than the window → empty
      "abcd",                     // exactly the window
      "héllo wörld — naïve façade ünïcödé padding here",
      "日本語のテキストでもバイト境界が正しいこと確認する文")
    val w = 4
    val df = rows.toDF("text")
    val got = df.select(HashFunctions.char_gram_hashes($"text", w).as("a"))
      .collect().map(_.getSeq[Long](0))
    val want = df.select(org.apache.spark.sql.functions.expr(
        s"CASE WHEN length(text) >= $w THEN transform(" +
          s"sequence(0, length(text) - $w), " +
          s"i -> xxhash64(substring(text, i + 1, $w))) " +
          "ELSE array() END").as("a"))
      .collect().map(_.getSeq[Long](0))
    got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"row $i: $g vs $e")
    }
  }

  test("word_gram_md5_long60 equals the HOF md5 chain as a sorted distinct set") {
    import spark.implicits._
    import graft.functions.HashFunctions
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two",                       // fewer tokens than n → join-all gram
      "solo",                          // single token
      "",                              // empty string → one "" token after split
      "dup dup dup dup dup",           // repeated grams → distinct collapses
      "héllo wörld naïve façade ünïcödé")
    val n = 3
    val prime = 2147483647L
    val df = rows.toDF("text")
      .select(split($"text", " ").as("a"))
    for (mod <- Seq(0L, prime)) {
      val got = df.select(HashFunctions.word_gram_md5_long60($"a", n, mod).as("x"))
        .collect().map(_.getSeq[Long](0))
      val modSql = if (mod > 0) s" % ${mod}L" else ""
      val want = df.select(expr(
          s"array_sort(array_distinct(transform(" +
            s"CASE WHEN size(a) < $n THEN array(concat_ws(' ', a)) " +
            s"ELSE transform(sequence(0, size(a) - $n), " +
            s"i -> concat_ws(' ', slice(a, i + 1, $n))) END, " +
            s"s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)$modSql)))").as("x"))
        .collect().map(_.getSeq[Long](0))
      got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g == e, s"mod=$mod row $i: $g vs $e")
      }
    }
  }

  test("word_gram_md5_hex is bit-identical to md5(concat_ws(slice)) per position") {
    import spark.implicits._
    import graft.functions.HashFunctions
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b c",                          // exactly n tokens → one gram
      "héllo wörld naïve façade ünïcödé boundary test")
    val n = 3
    val df = rows.toDF("text").select(split($"text", " ").as("a"))
    val got = df.select(HashFunctions.word_gram_md5_hex($"a", n).as("x"))
      .collect().map(_.getSeq[String](0))
    val want = df.select(expr(
        s"transform(sequence(0, size(a) - $n), " +
          s"i -> md5(concat_ws(' ', slice(a, i + 1, $n))))").as("x"))
      .collect().map(_.getSeq[String](0))
    got.zip(want).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g == e, s"row $i: $g vs $e")
    }
    // fewer than n tokens → empty (the callers' size >= n guard domain)
    val short = Seq("one two").toDF("text").select(split($"text", " ").as("a"))
      .select(HashFunctions.word_gram_md5_hex($"a", n).as("x"))
      .collect().head.getSeq[String](0)
    assert(short.isEmpty)
  }

  test("native text stats are bit-identical to the regex chains") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val rows = Seq(
      "The quick, brown FOX jumps!  Over the lazy dog?",
      "",                                  // empty
      " \t\n ",                            // whitespace-only
      "\tleading tab and trailing\n",      // edge whitespace
      "one",                               // single token
      "a  b\t\tc\nd",                      // mixed separators
      "Héllo WÖRLD — naïve FAÇADE ünïcödé İstanbul ÅNGSTRÖM",
      "日本語 テキスト 混在 ASCII Punct!?",
      "semi;colons: and (parens) [brackets] {braces} <angles> @at #hash")
    val df = rows.toDF("text")
    def check(name: String, got: org.apache.spark.sql.Column,
        want: org.apache.spark.sql.Column): Unit = {
      val g = df.select(got.cast("string").as("v")).collect().map(_.getString(0))
      val w = df.select(want.cast("string").as("v")).collect().map(_.getString(0))
      g.zip(w).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a == b, s"$name row $i (${rows(i).take(30)}...): $a vs $b")
      }
    }
    check("punct", TextFunctions.punct_count($"text"),
      size(regexp_extract_all($"text", lit("\\p{Punct}"), lit(0))).cast("long"))
    check("upper", TextFunctions.upper_count($"text"),
      size(regexp_extract_all($"text", lit("[A-Z]"), lit(0))).cast("long"))
    check("wstok", TextFunctions.ws_token_count($"text"), {
      val stripped = regexp_replace($"text", "^\\s+|\\s+$", "")
      when(stripped === "", lit(0L))
        .otherwise(size(split(stripped, "\\s+")).cast("long"))
    })
    check("tokens", TextFunctions.normalized_tokens($"text").cast("string"),
      split(trim(regexp_replace(lower($"text"), "\\s+", " ")), " ")
        .cast("string"))
  }

  test("sql functions agree with the column API") {
    GraftExtensions.registerFunctions(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_v2")
    import graft.ops.Dedup
    val viaSql = spark.sql(
      """SELECT doc_id, graft_simhash(graft_ngram_hashes(
        |  split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' '), 3)) AS simhash
        |FROM docs_v2""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaApi = Dedup.simhash(Tables.documents(spark, sf), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaApi)
  }
}
