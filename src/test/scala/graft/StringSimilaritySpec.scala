package graft

import graft.functions.StringSimilarity.jaro_winkler
import org.apache.spark.sql.functions._

/** Unit spec for the JaroWinkler expression: pinned textbook values
  * (the same ones DuckDB/fuzzystrmatch produce — the q_fuzzy_join
  * oracle then pins full-query agreement), the 0.7 boost threshold,
  * the 4-char prefix cap, empties, nulls, and codegen/interpreted
  * agreement.
  */
class StringSimilaritySpec extends SparkSpec {

  private def jw(a: String, b: String): Double = {
    import spark.implicits._
    Seq((Option(a), Option(b))).toDF("a", "b")
      .select(jaro_winkler($"a", $"b")).head().getDouble(0)
  }

  test("textbook values match the published Jaro-Winkler definition") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(jw("CRATE", "TRACE") == 0.7333333333333334) // no common prefix
    assert(jw("abc", "abc") == 1.0)
  }

  test("boost applies only above 0.7 jaro; prefix capped at 4") {
    // jaro = 0.6 with a 4-char common prefix: below threshold, no boost
    assert(jw("abcdxxxxxx", "abcdyyyyyy") == 0.6)
    // 6-char common prefix counts as 4: 0.91667 + 0.4*(1-0.91667)
    assert(math.abs(jw("abcdefuvwxyz", "abcdefzyxwvu") - 0.95) < 1e-12)
  }

  test("degenerate inputs: empties zero, window-0 transposition, nulls propagate") {
    assert(jw("", "abc") == 0.0)
    assert(jw("", "") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0 → no cross-position match
    import spark.implicits._
    val r = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(jaro_winkler($"a", $"b")).head()
    assert(r.isNullAt(0))
  }

  test("codegen and interpreted paths agree on random inputs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def word() = (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val pairs = (0 until 200).map(_ => (word(), word()))
    val df = pairs.toDF("a", "b")
    val viaCodegen = df.select(jaro_winkler($"a", $"b")).collect().map(_.getDouble(0))
    val keys = Seq("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val interpreted = df.select(jaro_winkler($"a", $"b")).collect().map(_.getDouble(0))
      assert(viaCodegen.sameElements(interpreted))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
