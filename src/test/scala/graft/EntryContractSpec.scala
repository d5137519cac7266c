package graft

/** The driver-contract invariants the correctness gate relies on:
  * every query key carries an oracle (the round-7 achievement this
  * spec locks against future drift), and the flagship entry returns
  * rows at the smoke scale.
  */
class EntryContractSpec extends SparkSpec {

  test("every query has an oracle: the 100% sweep cannot silently regress") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${(o -- q).toSeq.sorted}")
    assert(q == o,
      s"queries without oracles: ${(q -- o).toSeq.sorted} — add the SQL twin " +
        "(md5-seeded variant if the trained path is not SQL-expressible)")
  }

  test("entry() smoke: flagship query returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
