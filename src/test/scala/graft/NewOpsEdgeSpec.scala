package graft

import graft.etl.Scd2
import graft.ops.{Bpe, Expectations, PageRank, Similarity}
import org.apache.spark.sql.functions._

/** Degenerate inputs through the round's new operators: empty frames
  * come back empty (right schema), not as exceptions or nulls.
  */
class NewOpsEdgeSpec extends SparkSpec {

  private def emptyOf(cols: String*) = {
    import spark.implicits._
    Seq.empty[(Long, java.sql.Timestamp, String)].toDF(cols: _*)
  }

  test("scd2: empty change log and empty merge batch") {
    import spark.implicits._
    val empty = emptyOf("k", "ts", "status")
    val dim = Scd2.build(empty, "k", "ts", Seq("status"))
    assert(dim.columns.toSeq ==
      Seq("k", "valid_from", "valid_to", "version", "is_current", "status"))
    assert(dim.count() == 0)
    val full = Scd2.build(Seq((1L,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a"))
      .toDF("k", "ts", "status"), "k", "ts", Seq("status"))
    // merging an empty batch is the identity
    val merged = Scd2.merge(full, empty, "k", "ts", Seq("status"))
    assert(merged.collect().map(_.toSeq).toSet ==
      full.collect().map(_.toSeq).toSet)
  }

  test("expectations: empty batch reports zero counts and passes enforce") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val rules = Seq("positive" -> (col("v") > 0))
    val m = Expectations.metrics(empty, rules).collect()
    assert(m.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("positive", 0L, 0L)))
    assert(Expectations.enforce(empty, rules).count() == 0)
  }

  test("pagerank: empty graph refuses, self-loop-free singleton works") {
    import spark.implicits._
    assertThrows[IllegalArgumentException] {
      PageRank.run(Seq.empty[(Long, Long)].toDF("src", "dst"), 1)
    }
    val pair = PageRank.run(Seq((1L, 2L)).toDF("src", "dst"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pair.keySet == Set(1L, 2L))
    assert(pair(2L) > pair(1L)) // sink collects, source keeps the floor
  }

  test("knn graph and bpe on degenerate corpora") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.knnGraph(empty, "embedding", "vec_id", 3).count() == 0)
    graft.ops.Dedup.releaseCaches()
    // no repeated pair anywhere -> learner stops early with no merges
    val docs = Seq("ab cd", "ef gh").toDF("text")
    val merges = Bpe.learn(docs, "text", nMerges = 10)
    assert(merges.isEmpty)
    // encoding with an empty merge table = characters
    val enc = graft.functions.BpeEncode(null, merges)
    assert(enc.encodeWord("abc").toSeq == Seq("a", "b", "c"))
  }
}
