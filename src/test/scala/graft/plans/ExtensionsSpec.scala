package graft.plans

import graft.SparkSpec

class ExtensionsSpec extends SparkSpec {

  test("kernels are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val cos = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect().head.getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val n = spark.sql("SELECT graft_number('1.234.567,89') AS v").collect().head.getDouble(0)
    assert(n === 1234567.89)
    val sh = spark.sql("SELECT size(graft_shingles('a b c d', 2)) AS n").collect().head.getInt(0)
    assert(sh === 3)
    val sim = spark.sql(
      "SELECT graft_simhash(array('x','y')) = graft_simhash(array('x','y')) AS eq")
      .collect().head.getBoolean(0)
    assert(sim)
    val mh = spark.sql("SELECT size(graft_minhash(array('a','b'), 16)) AS k").collect().head.getInt(0)
    assert(mh === 16)
    val rep = spark.sql(
      "SELECT graft_rep_stats(array('x','x','y'))[0] AS dup").collect().head.getDouble(0)
    assert(rep === 1.0 / 3)
    val lrep = spark.sql(
      "SELECT graft_line_rep_stats('a\na\nb')[0] AS dup").collect().head.getDouble(0)
    assert(lrep === 1.0 / 3)
    val mkh = spark.sql(
      "SELECT size(graft_min_k_hashes(array('a','b','c'), 2)) AS n").collect().head.getInt(0)
    assert(mkh === 2)
    // Spark's chr() is ASCII-mod-256 (unlike DuckDB's unicode chr), so
    // the combining acute rides in the Scala literal instead
    val norm = spark.sql(
      "SELECT graft_normalize_text('cafe\u0301') AS t").collect().head.getString(0)
    assert(norm === "café")
    val wh = spark.sql(
      "SELECT size(graft_window_hashes('a b c d e', 3)) AS n").collect().head.getInt(0)
    assert(wh === 3)
    val probes = spark.sql(
      "SELECT size(graft_lsh_probes(array(0.5D, -0.25D, 1.0D), 4, 7)) AS n")
      .collect().head.getInt(0)
    assert(probes === 7)
  }

  test("GraftExtensions class injects the same functions via session extensions") {
    // newSession + explicit extensions application — getOrCreate would
    // silently reuse the shared test session and mask a broken injection
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val fresh = spark.newSession()
    GraftExtensions.functions.foreach { case (name, _, builder) =>
      fresh.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    val v = fresh.sql("SELECT graft_number('2,5') AS v").collect().head.getDouble(0)
    assert(v === 2.5)
  }
}
