package graft

import graft.functions.{BpeEncode, BpeFunctions}
import graft.ops.Bpe
import org.apache.spark.sql.functions._

/** BPE learn + encode vs an independent sequential reference, plus the
  * losslessness and learnability invariants.
  */
class BpeSpec extends SparkSpec {

  /** Independent reference: apply merges strictly IN LEARNED ORDER
    * (Sennrich's original formulation) — a different algorithm from
    * the expression's lowest-rank-present loop; on tables produced by
    * the learner the two must agree.
    */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = word.map(_.toString)
    merges.foreach { case (a, b) =>
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
          out += a + b; j += 2
        } else { out += syms(j); j += 1 }
      }
      syms = out.toSeq
    }
    syms
  }

  test("learn: most frequent pair first, deterministic ties") {
    import spark.implicits._
    val docs = Seq("low low low lower lower", "newest newest low").toDF("text")
    val merges = Bpe.learn(docs, "text", nMerges = 3)
    // 'lo' appears 6x — the clear winner; then 'lo'+'w' (6x)
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")))
    assert(merges.size == 3)
  }

  test("encode expression matches the in-order reference on the corpus") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val merges = Bpe.learn(docs, "text", nMerges = 40)
    assert(merges.size == 40)
    val got = docs
      .select($"doc_id", $"text",
        BpeFunctions.bpe_tokens($"text", merges).as("toks"))
      .collect()
    got.foreach { r =>
      val want = r.getString(1).split("\\s+").filter(_.nonEmpty)
        .flatMap(w => refEncode(w, merges))
      assert(r.getSeq[String](2) == want.toSeq,
        s"doc ${r.getLong(0)} segmentation differs")
    }
  }

  test("segmentation is lossless and merges compress") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val merges = Bpe.learn(docs, "text", nMerges = 40)
    val enc = BpeEncode(null, merges) // direct word-level drive
    val rows = docs.select($"text").collect().map(_.getString(0))
    var chars = 0L
    var toks = 0L
    rows.foreach { text =>
      text.split("\\s+").filter(_.nonEmpty).foreach { w =>
        val t = enc.encodeWord(w)
        assert(t.mkString == w, s"lossy segmentation of '$w'")
        chars += w.length
        toks += t.length
      }
    }
    assert(toks < chars * 65 / 100, s"40 merges should compress well " +
      s"below the char count on this corpus: $toks tokens vs $chars chars")
  }

  test("encoding a training word reproduces the learner's segmentation") {
    import spark.implicits._
    // tiny vocabulary, merges learned to exhaustion of repeats
    val docs = Seq("abab abab abcd").toDF("text")
    val merges = Bpe.learn(docs, "text", nMerges = 10)
    val enc = BpeEncode(null, merges)
    // 'abab' occurs 2x: its pairs keep repeating until it is one token
    assert(enc.encodeWord("abab").mkString == "abab")
    assert(enc.encodeWord("abab").length == 1)
  }
}
