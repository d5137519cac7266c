package graft

import graft.ops.{TextAnalysis => TA}
import graft.plans.TopK
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style tests: ScalaCheck generators (fixed seed → no flake),
  * evaluated through the real Spark expressions in one batch per
  * property.
  */
class PropertySpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val messyText: Gen[String] = for {
    words <- Gen.listOfN(12, Gen.oneOf(
      "the", "Cat", "DOG", "a", "an", "run!", "x,y", "zebra", "", " ", "\t"))
    sep <- Gen.oneOf(" ", "  ", " \t ")
  } yield words.mkString(sep)

  test("property: normalize is idempotent and case/whitespace canonical") {
    import spark.implicits._
    val df = samples(messyText, 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = df.select($"id", TA.normalize($"text").as("n1"),
      TA.normalize(TA.normalize($"text")).as("n2")).collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2)) // idempotent
      val n = r.getString(1)
      assert(!n.contains("  ") && n == n.toLowerCase) // canonical
    }
  }

  test("property: fingerprint invariant under whitespace/case noise") {
    import spark.implicits._
    val base = samples(Gen.listOfN(8, Gen.alphaStr.suchThat(_.nonEmpty)), 100)
      .map(_.mkString(" "))
    val df = base.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "  " + t.toUpperCase.replace(" ", "   ") + " ")
    }.toDF("id", "clean", "noisy")
    val rows = df.select(TA.fingerprint($"clean").as("a"),
      TA.fingerprint($"noisy").as("b")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("degenerate text: zero tokens, total quality, und language") {
    import graft.ops.TextAnalysis
    import spark.implicits._
    val df = Seq("", "   ", "\t \n", "xyzzy qwerty 12345").toDF("text")
      .select($"text",
        TextAnalysis.wsTokenCount($"text").as("ntok"),
        TextAnalysis.qualityScore($"text", length($"text").cast("long")).as("q"),
        TextAnalysis.langPredict($"text").as("lang"))
      .collect()
    // empty / whitespace-only: 0 tokens (not split("") = [""] = 1)
    assert(df(0).getLong(1) == 0 && df(1).getLong(1) == 0 && df(2).getLong(1) == 0)
    // quality is total: a real number in [0,1], never null
    df.foreach { r =>
      assert(!r.isNullAt(2), s"null quality for ${r.getString(0)}")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
    }
    // marker-free text is 'und', not the first language in the list
    assert(df.forall(_.getString(3) == "und"))
  }

  test("property: ws tokens never exceed bpe tokens on nonempty text") {
    import spark.implicits._
    val df = samples(messyText.suchThat(_.trim.nonEmpty), 200).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = df.select(TA.wsTokenCount($"text").as("ws"),
      TA.bpeTokenCount($"text").as("bpe")).collect()
    rows.foreach(r => assert(r.getLong(0) <= r.getLong(1) || r.getLong(1) == 0))
  }

  test("property: SCD2 merge(prefix, suffix) == build(all) on random change logs") {
    import graft.etl.Scd2
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // per-key strictly increasing timestamps, random states
    val changes = (0 until 40).flatMap { key =>
      val n = 1 + rnd.nextInt(8)
      var t = rnd.nextInt(1000)
      (0 until n).map { _ =>
        t += 1 + rnd.nextInt(500)
        (key.toLong,
          java.sql.Timestamp.valueOf(f"2024-01-01 00:00:00").toInstant
            .plusSeconds(t * 60L),
          s"state${rnd.nextInt(3)}")
      }
    }.map { case (k, i, v) => (k, java.sql.Timestamp.from(i), v) }
    // split at a global time: every suffix row is later than every
    // prefix row of its key — the merge contract
    val cut = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val df = changes.toDF("k", "ts", "status")
    val prefix = df.filter($"ts" < cut)
    val suffix = df.filter($"ts" >= cut)
    assert(prefix.count() > 0 && suffix.count() > 0)
    val merged = Scd2.merge(Scd2.build(prefix, "k", "ts", Seq("status")),
      suffix, "k", "ts", Seq("status"))
    val rebuilt = Scd2.build(df, "k", "ts", Seq("status"))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    assert(rows(merged) == rows(rebuilt))
  }

  test("property: PageRank identical across partition counts") {
    import graft.ops.PageRank
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(300)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
    def run(parts: Int) = PageRank.run(
      edges.toDF("src", "dst").repartition(parts), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // integer fixed-point arithmetic ⇒ bit-identical under any layout
    assert(run(1) == run(7))
  }

  test("property: TopK.perGroup equals per-group sort-take on random data") {
    import spark.implicits._
    val gen = for {
      g <- Gen.choose(0, 5)
      v <- Gen.choose(-1000, 1000)
    } yield (g, v)
    val data = samples(gen, 400).zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }
    val df = data.toDF("id", "grp", "v")
    val got = TopK.perGroup(df, Seq($"grp"), Seq($"v".desc, $"id"), k = 5)
      .collect().map(r => (r.getAs[Int]("grp"), r.getAs[Long]("id"))).toSet
    val want = data.groupBy(_._2).toSeq.flatMap { case (g, rows) =>
      rows.sortBy(t => (-t._3, t._1)).take(5).map(t => (g, t._1))
    }.toSet
    assert(got == want)
  }

  test("property: commit log round-trips hostile string stats and paths") {
    import graft.etl.DeltaLite
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // stats min/max are stringified DATA values riding the regex-based
    // commit-log JSON — quotes, backslashes, newlines, tabs, unicode
    // and JSON-ish fragments must all survive render→parse→prune
    val nasty = Seq(
      """a"quote""", """b\\back\slash""", "c\nnew\nline", "d\ttab",
      "e\u001f\u001eseps", "f{\"json\":\"ish\"}", "g\u00e9\u4e2d\u6587\ud83d\ude00",
      "h,comma:colon", "", "  leading and trailing  ")
    val rows = nasty.zipWithIndex.map { case (v, i) => (v, i.toLong) }
    val root = java.nio.file.Files.createTempDirectory("graft-prop-log").toString
    val t = DeltaLite(spark, root, statsKey = "s")
    rows.grouped(3).foreach(g => t.append(g.toDF("s", "i")))
    t.restats(Seq("s", "i"))
    // a FRESH handle replays the published log bytes
    val re = DeltaLite(spark, root, statsKey = "s")
    val got = re.read().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == rows.toSet, "hostile values must survive the log round trip")
    // pruned point reads still find each value (stats not corrupted)
    nasty.foreach { v =>
      val hit = re.readIndexed().filter(col("s") === v).collect()
      assert(hit.length == 1, s"lookup failed for ${v.take(20)}")
    }
    // checkpoint + trim replays through the synthetic commit encoding
    re.checkpointNow(); re.cleanLog()
    val re2 = DeltaLite(spark, root, statsKey = "s")
    assert(re2.read().collect().map(_.getString(0)).toSet == nasty.toSet)
  }
}
