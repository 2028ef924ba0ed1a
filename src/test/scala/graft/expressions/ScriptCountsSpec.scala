package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass UTF-8 script histogram: class ranges (with the ×/÷ holes
  * and astral 4-byte codepoints), per-codepoint counting, codegen vs
  * interpreted agreement, null contract.
  */
class ScriptCountsSpec extends SparkSpec {
  import spark.implicits._

  private def counts(text: String): Seq[Long] =
    ScriptCounts(org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(text)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq

  test("class ranges: letters, digits, space, latin-ext, cyrillic, cjk, other") {
    //       ascii digit ws latin cyr cjk other
    assert(counts("Ab1 ,") == Seq(2, 1, 1, 0, 0, 0, 1))
    assert(counts("äöüß") == Seq(0, 0, 0, 4, 0, 0, 0))
    assert(counts("привет") == Seq(0, 0, 0, 0, 6, 0, 0))
    assert(counts("中文 ok") == Seq(2, 0, 1, 0, 0, 2, 0))
    // the multiplication/division signs sit INSIDE the Latin-1 letter
    // range but are not letters — the documented holes
    assert(counts("×÷") == Seq(0, 0, 0, 0, 0, 0, 2))
    // astral (4-byte) codepoints decode as ONE codepoint -> other
    assert(counts("😀") == Seq(0, 0, 0, 0, 0, 0, 1))
    assert(counts("") == Seq(0, 0, 0, 0, 0, 0, 0))
    // totals are per codepoint: sum equals codePointCount
    val s = "mix äэ中 1😀"
    assert(counts(s).sum == s.codePointCount(0, s.length))
  }

  test("column path (codegen) agrees with interpreted eval; null in null out") {
    val rows = Seq(Some("a я 中 5"), None).toDF("t")
      .select(ScriptCounts(col("t")).as("c")).collect()
    assert(rows(0).getSeq[Long](0) == counts("a я 中 5"))
    assert(rows(1).isNullAt(0))
  }
}
