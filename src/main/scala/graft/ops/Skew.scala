package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md §4).
  *
  * AQE's skew-join split handles most cases at runtime; explicit
  * salting remains the tool when one side has pathological hot keys and
  * the other side is small enough to replicate per salt but too big to
  * broadcast. The hot side gets a random-but-deterministic salt in
  * [0, salts); the other side is exploded ×salts; the join key becomes
  * (key, salt) — hot keys spread over `salts` reducers.
  */
object Skew {

  /** Inner join `skewed ⋈ other` on `key`, salting the skewed side.
    * Deterministic: the salt comes from hashing the skewed row's key
    * plus a per-row disambiguator column (e.g. a unique id).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      rowDisambiguator: String, salts: Int = 8): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(hash(col(key), col(rowDisambiguator)), lit(salts)))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
