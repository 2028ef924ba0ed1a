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

  test("malformed UTF-8 never reads past numBytes: truncated tails and stray continuations") {
    def countsBytes(bs: Array[Byte]): Seq[Long] =
      ScriptCounts(org.apache.spark.sql.catalyst.expressions.Literal(
          UTF8String.fromBytes(bs),
          org.apache.spark.sql.types.StringType))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
    // truncated multi-byte leads at end of buffer: every invalid byte
    // (the lead AND its orphaned continuations) counts as one 'other',
    // and no read ever passes the end
    assert(countsBytes(Array(0xc3.toByte)) == Seq(0, 0, 0, 0, 0, 0, 1))
    assert(countsBytes(Array('a'.toByte, 0xe4.toByte, 0xb8.toByte)) ==
      Seq(1, 0, 0, 0, 0, 0, 2))
    assert(countsBytes(Array(0xf0.toByte, 0x9f.toByte, 0x98.toByte)) ==
      Seq(0, 0, 0, 0, 0, 0, 3))
    // continuation byte in lead position: 'other', advance one byte —
    // the following valid codepoint still counts
    assert(countsBytes(Array(0x80.toByte, 'z'.toByte)) ==
      Seq(1, 0, 0, 0, 0, 0, 1))
    // invalid lead 0xf8+: never the 4-byte branch
    assert(countsBytes(Array(0xff.toByte, '1'.toByte)) ==
      Seq(0, 1, 0, 0, 0, 0, 1))
    // well-formed input is byte-for-byte unchanged by the guards
    assert(countsBytes("mix äэ中 1😀".getBytes("UTF-8")) ==
      counts("mix äэ中 1😀"))
  }
}
