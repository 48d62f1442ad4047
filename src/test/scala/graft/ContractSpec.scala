package graft

/** Guards the driver contract itself: every oracle key must name a query,
  * and the flagship entry must return rows (the driver's smoke check).
  */
class ContractSpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("query names are unique and well-formed") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.distinct.size === names.size)
    assert(names.forall(n => n.nonEmpty && !n.contains(" ")))
  }

  test("entry() returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries declare resolvable plans at sf0.001 (schema-level check)") {
    // resolution (not execution): catches column typos/renames cheaply
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.nonEmpty, s"$name resolved to empty schema")
    }
  }
}
