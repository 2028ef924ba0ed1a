package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Clean-text fidelity vs the reference semantics
  * (reference batchPipeline.py:41-52): len<10 null, emoji strip, URL and
  * @mention removal, $ and # deletion, _ -> space, trim.
  */
class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def clean(xs: String*): Seq[Option[String]] =
    xs.toDF("t").select(TextFns.cleanText(col("t")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq

  test("short text becomes null (dropna gate)") {
    assert(clean("tiny", "123456789") == Seq(None, None))
    assert(clean("exactly10!").head.isDefined)
  }

  test("urls and mentions removed") {
    assert(clean("buy AAPL now http://x.co/abc today").head.contains("buy AAPL now  today"))
    assert(clean("hello @trader42 world wide").head.contains("hello  world wide"))
    assert(clean("see www.example.com for info").head.contains("see  for info"))
  }

  test("dollar/hash deleted, underscore to space, trimmed") {
    assert(clean("  $AAPL beats #earnings big_time  ").head.contains("AAPL beats earnings big time"))
  }

  test("emoji stripped") {
    assert(clean("stocks up 😀🚀 to the moon").head.contains("stocks up  to the moon"))
  }

  test("null input stays null") {
    val out = Seq[Option[String]](None, Some("a decent length text"))
      .toDF("t").select(TextFns.cleanText(col("t")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(out.head.isEmpty && out(1).nonEmpty)
  }

  test("tokens/shingles/fingerprint basics") {
    val df = Seq("The  quick   brown fox").toDF("t")
    val toks = df.select(TextFns.tokens(col("t"))).as[Seq[String]].head()
    assert(toks == Seq("the", "quick", "brown", "fox"))
    val sh = df.select(TextFns.wordShingles(col("t"), 2)).as[Seq[String]].head()
    assert(sh == Seq("the quick", "quick brown", "brown fox"))
    // fingerprint is whitespace/case-insensitive
    val fps = Seq("A  b\tC", "a b c").toDF("t")
      .select(TextFns.fingerprint(col("t"))).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("langId picks marker-majority language, und when none") {
    val out = Seq("the cat is on the mat", "xyzzy qwerty")
      .toDF("t").select(TextFns.langId(col("t"))).as[String].collect()
    assert(out(0) == "en" && out(1) == "und")
  }

  test("langId on null text is null, not an arbitrary language") {
    val out = Seq[Option[String]](None, Some("the cat is here"))
      .toDF("t").select(TextFns.langId(col("t")).as("l"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(None, Some("en")))
  }
}
