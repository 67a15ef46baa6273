package graft

/** The driver's t1 smoke contract: entry() must return ≥1 row on sf0.001,
  * and every registered oracle key must have a registered query. */
class EntrySpec extends SparkSpec {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() >= 1)
  }

  test("oracleSql keys ⊆ queries keys; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val extra = SparkEntry.oracleSql.keySet -- qs
    assert(extra.isEmpty, s"oracle without query: $extra")
    assert(qs.forall(_.matches("[a-z0-9_]+")), "snake_case names only")
  }
}
