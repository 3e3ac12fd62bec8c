package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** C4-style HTML extraction: strip semantics, the published line
  * rules, entity decode order, and the page gates.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def linesOf(html: String): Seq[String] =
    Seq(html).toDF("h")
      .select(HtmlExtract.cleanLines(col("h")).as("l"))
      .collect().head.getSeq[String](0)

  test("script/style/comment bodies are removed, not extracted") {
    val html = "<html><script>var kept = 'should not appear here now.';" +
      "</script><style>p { color: red; }</style><!-- a comment. -->" +
      "<body><p>Real content line with five words.</p></body></html>"
    assert(linesOf(html) === Seq("Real content line with five words."))
  }

  test("C4 line rules: word count, terminal punctuation, boilerplate") {
    val html = Seq(
      "<p>Too short line here.</p>",                       // 4 words
      "<p>No terminal punctuation on this line</p>",       // no [.!?"]
      "<p>Please enable javascript for this site now.</p>", // javascript
      "<p>This site uses cookie tracking for ads.</p>",    // cookie
      "<p>This is a real retained sentence.</p>",          // kept
      "<p>Is this question line retained too?</p>"         // kept (?)
    ).mkString
    assert(linesOf("<body>" + html + "</body>") === Seq(
      "This is a real retained sentence.",
      "Is this question line retained too?"))
  }

  test("entities decode with &amp; LAST (no double decode)") {
    val html = "<p>Tom &amp; Jerry saw &amp;lt; stay literal today.</p>"
    // &amp;lt; must become the literal text "&lt;", NOT "<"
    assert(linesOf(html) ===
      Seq("Tom & Jerry saw &lt; stay literal today."))
  }

  test("block-level closers create line boundaries; inline tags do not") {
    val html = "<p>First real sentence is right here.</p>" +
      "<p>Second <b>bolded</b> sentence is also here.</p>"
    assert(linesOf(html).size === 2)
    assert(linesOf(html)(1) === "Second bolded sentence is also here.")
  }

  test("page gates: lorem ipsum, braces, and minimum retained lines") {
    def gate(lines: Seq[String]): Boolean = {
      val df = Seq(lines.mkString("\n")).toDF("c")
      df.select(HtmlExtract.pageKept(col("c"),
        lit(lines.size)).as("k")).collect().head.getBoolean(0)
    }
    val good = Seq("One real sentence sits right here.",
      "Two real sentences sit right here.",
      "Three real sentences sit right here.")
    assert(gate(good))
    assert(!gate(good.updated(0, "Lorem ipsum dolor sit amet line.")))
    assert(!gate(good.updated(1, "function f() { return x; } here.")))
    assert(!gate(good.take(2)))
  }
}
