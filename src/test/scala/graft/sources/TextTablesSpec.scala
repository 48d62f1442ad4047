package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The simple/rst/mediawiki text-table readers — the last readers-dict
  * suffixes the reference dispatches (import_utils.py:632-648) that the
  * engine did not (r11 "what's missing" #1). Fixtures are literal
  * renderings; each format also round-trips through its own renderer.
  */
class TextTablesSpec extends SparkSpec {

  private def write(suffix: String, content: String): String = {
    val p = Files.createTempFile("ttab", suffix)
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("simple format: spans from the dash separator, spaces inside values") {
    val p = write(".simple",
      """name        qty  note
        |----------  ---  ------------
        |widget      3    two words
        |gizmo bolt  12   x
        |""".stripMargin)
    try {
      val t = graft.Tab.fromFile(spark, p)
      assert(t.df.columns.toSeq == Seq("name", "qty", "note"))
      val rows = t.df.orderBy("name").collect()
      assert(rows.map(_.getString(0)).toSeq == Seq("gizmo bolt", "widget"))
      assert(rows.map(_.get(1).toString).toSeq == Seq("12", "3"))
      assert(rows(1).getString(2) == "two words")
    } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
  }

  test("rst simple table: header between '=' separators") {
    val p = write(".rst",
      """========  ===
        |name      qty
        |========  ===
        |widget    3
        |gizmo     12
        |========  ===
        |""".stripMargin)
    try {
      val df = graft.Tab.fromFile(spark, p).df
      assert(df.columns.toSeq == Seq("name", "qty"))
      assert(df.count() == 2)
      assert(df.filter(col("name") === "gizmo").select("qty").head.get(0).toString == "12")
    } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
  }

  test("mediawiki table: ! headers, |- rows, || cells, caption ignored") {
    val p = write(".mediawiki",
      """{| class="wikitable"
        ||+ A caption
        |! name !! qty !! note
        ||-
        || widget || 3 || ok
        ||-
        || gizmo || 12 ||
        ||}
        |""".stripMargin)
    try {
      val df = graft.Tab.fromFile(spark, p).df
      assert(df.columns.toSeq == Seq("name", "qty", "note"))
      val rows = df.orderBy("name").collect()
      assert(rows.length == 2)
      assert(rows(0).getString(0) == "gizmo" && rows(0).get(2) == null)
      assert(rows(1).getString(2) == "ok")
    } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
  }

  test("render -> read roundtrips for all three formats") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta", 2.5), (2L, "gamma", -1.0), (3L, "d", 0.0))
      .toDF("id", "words", "score")
    Seq[(String, org.apache.spark.sql.DataFrame => String)](
      ".simple" -> (d => TextTables.renderSimple(d)),
      ".rst" -> (d => TextTables.renderRst(d)),
      ".mediawiki" -> (d => TextTables.renderMediawiki(d))).foreach {
      case (suffix, render) =>
        val p = write(suffix, render(df))
        try {
          val back = graft.Tab.fromFile(spark, p).df
            .select(col("id").cast("long"), col("words"),
              col("score").cast("double"))
            .orderBy("id").collect()
          assert(back.length == 3, suffix)
          assert(back(0).getString(1) == "alpha beta", suffix)
          assert(back(1).getDouble(2) == -1.0, suffix)
        } finally { Files.deleteIfExists(java.nio.file.Paths.get(p)); () }
    }
  }

  test("unknown text-table format errors clearly") {
    val e = intercept[IllegalArgumentException] {
      TextTables.readTextTable(spark, "/nonexistent", "orgmode")
    }
    assert(e.getMessage.contains("orgmode"))
  }
}
