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
      // see TsFlavorSpec: plan-only enumeration strands CacheScope
      // persists (no action ever releases them) — clear per query or the
      // accumulated entries OOM the shared test JVM after ~78 suites
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("withTempFile deletes the file on the failure path (no /tmp leak)") {
    val name = s"graft_contract_spec_${System.nanoTime()}.h5"
    val file = new java.io.File(sys.props("java.io.tmpdir"), name)
    val boom = intercept[RuntimeException] {
      SparkEntry.withTempFile(name) { p =>
        java.nio.file.Files.write(java.nio.file.Paths.get(p), Array[Byte](1, 2, 3))
        assert(file.exists)
        throw new RuntimeException("corrupt read")
      }
    }
    assert(boom.getMessage === "corrupt read") // original failure propagates
    assert(!file.exists, "temp file leaked on the failure path")
  }
}
