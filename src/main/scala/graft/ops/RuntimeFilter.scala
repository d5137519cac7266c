package graft.ops

import java.io.ByteArrayOutputStream

import graft.functions.BloomFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Runtime semi-join reduction: build a Bloom filter over the build
  * (dim) side's join keys and prune the probe (fact) side's scan with
  * it BEFORE the join's shuffle.
  *
  * Scale posture: at 100 TB the win is shuffle volume — a selective dim
  * (filters survive on few keys) means most fact rows can be dropped
  * map-side for the cost of `k` hash probes each, instead of being
  * shuffled to the join and discarded there. The filter build is a
  * distributed treeAggregate over the dim (`stat.bloomFilter`); the
  * bits ship to executors once as a codegen reference object. False
  * positives are harmless: the real join still runs and drops them —
  * the Bloom pass only reduces, never decides.
  *
  * This is the manual form of what Catalyst's own runtime-filter
  * injection does for selective joins; as a library operator it works
  * on any DataFrame pair regardless of optimizer heuristics.
  */
object RuntimeFilter {

  /** Serialized Bloom filter of `df`'s `keyCol` (LongType) values. */
  def buildBloom(df: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val bf = df.stat.bloomFilter(keyCol, expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `fact ⋈ dim` with the fact scan Bloom-pruned on the join key.
    * Equivalent to the plain inner join (false positives die in the
    * join); the fact side that reaches the shuffle is ~|matching| +
    * fpp·|fact| rows instead of |fact|.
    *
    * @param expectedItems sizing for the filter — pass the expected
    *                      distinct key count of the dim side
    */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val bits = buildBloom(dim, dimKey, expectedItems, fpp)
    fact.filter(BloomFunctions.bloom_might_contain(col(factKey), bits))
      .join(dim, col(factKey) === col(dimKey))
  }
}
