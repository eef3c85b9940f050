package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.UrlCurate

/** Planted edges for the HTML→text extraction chain and URL
  * canonicalization — the order-of-operations hazards the fixture
  * template can't isolate one at a time (corpus-level parity runs in
  * the `q_text_html_extract` / `q_curate_url_canon` oracles). */
class HtmlUrlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h")
      .select(TextFunctions.htmlExtract(col("h"))).head().getString(0)

  private def canon(url: String): Option[String] =
    Option(Seq(url).toDF("u")
      .select(UrlCurate.canonicalize(col("u"))).head().getString(0))

  test("script/style bodies stripped BEFORE tag pass (bare < inside)") {
    assert(extract("""a<script>if (1 < 2) { x("<div>"); }</script>b""") == "a b")
    assert(extract("""a<style>p > span { color: red }</style>b""") == "a b")
    // case-insensitive, attributes on the open tag
    assert(extract("""a<SCRIPT type="text/js">var x;</SCRIPT>b""") == "a b")
  }

  test("tags become spaces — adjacent block text never fuses") {
    assert(extract("<p>a</p><p>b</p>") == "a b")
    assert(extract("x<br/>y") == "x y")
  }

  test("entities decode AFTER tag strip; &amp; decodes last") {
    // text-level escaped markup survives as literal text
    assert(extract("<p>&lt;b&gt;bold&lt;/b&gt;</p>") == "<b>bold</b>")
    // one-level decode: &amp;lt; -> &lt; (NOT <)
    assert(extract("<p>&amp;lt;</p>") == "&lt;")
    assert(extract("<p>A &amp; B&nbsp;&quot;q&quot; &#39;s&#39;</p>")
      == "A & B \"q\" 's'")
  }

  test("comments stripped dot-all, whitespace collapsed, trimmed") {
    assert(extract("<body><!-- nav\nmenu -->  hi \n\t there </body>")
      == "hi there")
  }

  test("canonicalize: case, default ports, fragments, tracking params") {
    assert(canon("HTTPS://WWW.Ex.COM:443/A/b?utm_source=x&b=2&a=1#f")
      == Some("https://www.ex.com/A/b?a=1&b=2"))
    // default port is scheme-specific: :80 survives under https
    assert(canon("https://ex.com:80/x") == Some("https://ex.com:80/x"))
    assert(canon("http://ex.com:80/x") == Some("http://ex.com/x"))
    assert(canon("https://ex.com:8443/x") == Some("https://ex.com:8443/x"))
    // empty path -> /; all params dropped -> no '?'
    assert(canon("http://Ex.com?gclid=1&fbclid=2") == Some("http://ex.com/"))
    // param VALUES and path case preserved
    assert(canon("https://ex.com/P?Q=Zz") == Some("https://ex.com/P?Q=Zz"))
    // no scheme -> null (relative link, nothing to canonicalize)
    assert(canon("/relative/path") == None)
    assert(canon("example.com/x") == None)
  }

  test("canonicalDedup: messy variants collapse; null canons never do") {
    val docs = Seq(
      (1L, "HTTP://A.com:80/x?b=2&a=1#z"),
      (2L, "http://a.COM/x?a=1&b=2&utm_source=s"),
      (3L, "http://a.com/y"),
      (4L, "not a url"),
      (5L, "also not a url")).toDF("doc_id", "url")
    val out = UrlCurate.canonicalDedup(docs, "url", "doc_id")
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "http://a.com/x?a=1&b=2")
    assert(out(1).getString(1) == "http://a.com/x?a=1&b=2")
    assert(out(0).getLong(2) == 1L && !out(0).getBoolean(3))
    assert(out(1).getLong(2) == 1L && out(1).getBoolean(3))
    assert(out(2).getLong(2) == 3L && !out(2).getBoolean(3))
    // the two unparseable rows each rep themselves
    assert(out(3).isNullAt(1) && out(3).getLong(2) == 4L && !out(3).getBoolean(3))
    assert(out(4).isNullAt(1) && out(4).getLong(2) == 5L && !out(4).getBoolean(3))
  }
}
