package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlUrlSpec extends SparkSpec {
  import spark.implicits._

  private def strip1(html: String): String =
    Seq(html).toDF("h").select(TextFunctions.stripHtml($"h")).first().getString(0)

  private def host1(url: String): Option[String] =
    Option(Seq(url).toDF("u").select(TextFunctions.urlHost($"u")).first().getString(0))

  test("stripHtml: tags, script/style/comment blocks, entities, whitespace") {
    assert(strip1("<html><body><p>Hello <b>world</b></p></body></html>") === "Hello world")
    assert(strip1("before<script type=\"x\">var a = '<p>';</script>after") === "before after")
    assert(strip1("a<style>p { color: red }</style>b") === "a b")
    assert(strip1("x<!-- hidden <b>bold</b> -->y") === "x y")
    assert(strip1("1 &lt; 2 &amp;&amp; 3 &gt; 2, &quot;q&quot;, it&#39;s&nbsp;here")
      === "1 < 2 && 3 > 2, \"q\", it's here")
    // double-encoded stays single-decoded (&amp; decodes LAST)
    assert(strip1("&amp;lt;") === "&lt;")
    // case-insensitive block tags, multi-line
    assert(strip1("a<SCRIPT>\nx\n</SCRIPT>b") === "a b")
    // malformed nesting degrades to whitespace, never dropped text
    assert(strip1("a <p>text") === "a text")
  }

  test("urlHost: scheme required, www stripped, stops at / : ? #") {
    assert(host1("https://www.Example.COM/path?q=1") === Some("example.com"))
    assert(host1("http://sub.domain.org:8080/x") === Some("sub.domain.org"))
    assert(host1("ftp://files.net#frag") === Some("files.net"))
    assert(host1("no-scheme.com/path") === None)
    assert(host1("") === None)
  }
}
