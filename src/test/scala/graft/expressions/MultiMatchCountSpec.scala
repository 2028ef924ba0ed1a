package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern counting against a brute-force position
  * scan, overlap semantics, prefix/suffix pattern interplay, codegen vs
  * interpreted agreement, and the null contract.
  */
class MultiMatchCountSpec extends SparkSpec {
  import spark.implicits._

  private def brute(text: String, pats: Seq[String]): Seq[Long] =
    pats.map(p => (0 to text.length - p.length)
      .count(i => text.regionMatches(i, p, 0, p.length)).toLong)

  private def ac(text: String, pats: Seq[String]): Seq[Long] = {
    val e = MultiMatchCount(
      org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(text)),
      pats)
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
  }

  test("overlapping occurrences count at every match end") {
    assert(ac("aaa", Seq("aa")) == Seq(2L))
    assert(ac("aaaa", Seq("aa", "aaa")) == Seq(3L, 2L))
    assert(ac("abababa", Seq("aba")) == Seq(3L))
  }

  test("patterns that are prefixes/suffixes of each other all count") {
    // "she" contains "he"; "hers" shares the trie path with "he"
    val got = ac("ushers", Seq("he", "she", "hers", "his"))
    assert(got == Seq(1L, 1L, 1L, 0L))
  }

  test("matches brute force on random byte soup") {
    val rng = new scala.util.Random(17)
    val pats = Seq("ab", "bba", "aab", "abab", "b")
    (1 to 200).foreach { _ =>
      val s = (0 until rng.nextInt(40)).map(_ => if (rng.nextBoolean()) 'a' else 'b').mkString
      assert(ac(s, pats) == brute(s, pats), s"text=$s")
    }
  }

  test("column path (codegen) agrees with interpreted eval; null in null out") {
    val pats = Seq("the", "ing")
    val rows = Seq(Some("the thing singing"), Some(""), None).toDF("t")
      .select(MultiMatchCount(col("t"), pats).as("c"))
      .collect()
    assert(rows(0).getSeq[Long](0) == Seq(1L, 3L))
    assert(rows(1).getSeq[Long](0) == Seq(0L, 0L))
    assert(rows(2).isNullAt(0))
  }

  test("positions: every match start, 1-based, sorted, overlaps included") {
    def pos(text: String, pats: Seq[String]): Seq[(Int, Long)] = {
      val e = MultiMatchPositions(
        org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(text)),
        pats)
      e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
          .elementType)
        .map { r =>
          val row = r.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
          (row.getInt(0), row.getLong(1))
        }.toSeq
    }
    assert(pos("aaa", Seq("aa")) == Seq((0, 1L), (0, 2L)))
    assert(pos("ushers", Seq("he", "she", "hers")) ==
      Seq((1, 2L), (0, 3L), (2, 3L))) // sorted by (pos, patIdx)
    // positions agree with counts
    val rng = new scala.util.Random(23)
    val pats = Seq("ab", "bba", "b")
    (1 to 100).foreach { _ =>
      val s = (0 until rng.nextInt(30)).map(_ => if (rng.nextBoolean()) 'a' else 'b').mkString
      val byPat = pos(s, pats).groupBy(_._1).view.mapValues(_.size.toLong).toMap
      assert(pats.indices.map(i => byPat.getOrElse(i, 0L)) == ac(s, pats))
    }
  }

  test("positions: character offsets diverge from byte offsets on multi-byte text") {
    def pos3(text: String, pats: Seq[String]): Seq[(Int, Long, Long)] = {
      val e = MultiMatchPositions(
        org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(text)),
        pats)
      e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
          .elementType)
        .map { r =>
          val row = r.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
          (row.getInt(0), row.getLong(1), row.getLong(2))
        }.toSeq
    }
    // "dätä thé": ä/é are 2-byte UTF-8 — bytes d=1 ä=2-3 t=4 ä=5-6 ␣=7
    // t=8 h=9 é=10-11, chars d=1 ä=2 t=3 ä=4 ␣=5 t=6 h=7 é=8
    assert(pos3("dätä thé", Seq("thé", "dätä")) ==
      Seq((1, 1L, 1L), (0, 8L, 6L)))
    // ASCII: the two units coincide on every match
    assert(pos3("the theory", Seq("the")).forall { case (_, s, cs) => s == cs })
    // 3-byte and 4-byte codepoints ahead of the match shift bytes, not chars
    assert(pos3("€😀 abc", Seq("abc")) ==
      Seq((0, 9L, 4L))) // € is 3 bytes, 😀 is 4 bytes (one codepoint)
  }

  test("character offsets feed substring() and round-trip to the pattern") {
    val pats = Seq("thé", "dätä")
    val lens = pats.map(p => p.codePointCount(0, p.length).toLong)
    val rows = Seq("xä dätä yé thé", "no match here", "dätä")
      .toDF("t")
      .select(col("t"),
        explode(MultiMatchPositions(col("t"), pats)).as("m"))
      .select(
        element_at(typedlit(pats), col("m.p") + 1).as("pat"),
        col("t").substr(col("m.cs"),
          element_at(typedlit(lens), col("m.p") + 1)).as("cut"),
        col("m.s").as("s"), col("m.cs").as("cs"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"cut '${r.getString(1)}' != pattern '${r.getString(0)}'"))
    // and the byte offset would NOT round-trip where multi-byte text precedes
    assert(rows.exists(r => r.getLong(2) != r.getLong(3)))
  }

  test("redact: union of spans, overlaps and nesting included; no-match passes through") {
    def red(text: String, pats: Seq[String]): String =
      MultiMatchRedact(
        org.apache.spark.sql.catalyst.expressions.Literal(UTF8String.fromString(text)),
        pats).eval(null).asInstanceOf[UTF8String].toString
    assert(red("the thing", Seq("the")) == "*** thing")
    assert(red("ushers", Seq("she", "hers")) == "u*****") // overlap unions
    assert(red("aaa", Seq("aa")) == "***")                // self-overlap unions
    assert(red("abcabc", Seq("abcabc", "ca")) == "******") // nesting
    assert(red("clean text", Seq("zzz")) == "clean text")
    // redacted == brute mask from positions
    val rng = new scala.util.Random(41)
    val pats = Seq("ab", "bba", "b")
    (1 to 100).foreach { _ =>
      val s = (0 until rng.nextInt(25)).map(_ => if (rng.nextBoolean()) 'a' else 'b').mkString
      val mask = Array.fill(s.length)(false)
      for (p <- pats; i <- 0 to s.length - p.length if s.regionMatches(i, p, 0, p.length);
           j <- i until i + p.length) mask(j) = true
      val want = s.zipWithIndex.map { case (c, i) => if (mask(i)) '*' else c }.mkString
      assert(red(s, pats) == want, s"text=$s")
    }
  }

  test("one pass regardless of dictionary size: dense-DFA walk over bytes") {
    // long dictionary, all counted in a single eval
    val pats = (0 until 50).map(i => f"w$i%02d")
    val text = (0 until 50).flatMap(i => Seq(f"w$i%02d", f"w$i%02d")).mkString(" ")
    assert(ac(text, pats) == Seq.fill(50)(2L))
  }
}
