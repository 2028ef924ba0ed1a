package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Writing-system (Unicode script) profile of a document in ONE pass
  * over its UTF-8 bytes — the language-ID companion a multilingual
  * curation pipeline needs: n-gram language ID mistakes romanized text
  * and transliterations, while the SCRIPT histogram is definitional
  * (codepoint ranges), so "lang=ru but 0 Cyrillic codepoints" is a
  * mislabel flag and "40% CJK / 40% Latin" is a mixed-document signal
  * no scalar language label carries.
  *
  * The walk decodes codepoints straight off the UTF-8 lead bytes (no
  * per-char String allocation, O(bytes) per row, reference-object call
  * inside whole-stage codegen) and buckets them into SEVEN fixed,
  * definitional classes an oracle replays via per-char codepoint
  * ranges:
  *
  *  0 ASCII letter  [A-Za-z]
  *  1 digit         [0-9]
  *  2 whitespace    space/tab/LF/CR
  *  3 Latin-1/Extended letter  U+00C0–U+024F minus × (U+00D7) ÷ (U+00F7)
  *  4 Cyrillic      U+0400–U+04FF
  *  5 CJK unified   U+4E00–U+9FFF
  *  6 other         everything else (ASCII punctuation included)
  *
  * Returns the 7 counts in class order; null text ⇒ null. Counting is
  * per CODEPOINT (astral pairs count once — the 4-byte branch).
  */
case class ScriptCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "script_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"script_counts requires string, got ${child.dataType}")

  private def clsOf(cp: Int): Int =
    if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) 0
    else if (cp >= '0' && cp <= '9') 1
    else if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r') 2
    else if (cp >= 0xc0 && cp <= 0x24f && cp != 0xd7 && cp != 0xf7) 3
    else if (cp >= 0x400 && cp <= 0x4ff) 4
    else if (cp >= 0x4e00 && cp <= 0x9fff) 5
    else 6

  /** Single entry for interpreted eval AND generated code. Malformed
    * UTF-8 never reads past numBytes: a truncated multi-byte tail, a
    * continuation byte in lead position, or an invalid lead (0xf8+)
    * counts as ONE 'other' codepoint and the walk advances one byte —
    * defensive against non-string-born binary, same spirit as the
    * bounds-checked walk matchEndsWithChars gets from the JVM string.
    */
  def countsOf(text: UTF8String): ArrayData = {
    val counts = new Array[Long](7)
    val n = text.numBytes
    var i = 0
    while (i < n) {
      val b0 = text.getByte(i) & 0xff
      var cp = 0
      if (b0 < 0x80) { cp = b0; i += 1 }
      else if ((b0 & 0xe0) == 0xc0 && i + 1 < n) {
        cp = ((b0 & 0x1f) << 6) | (text.getByte(i + 1) & 0x3f)
        i += 2
      } else if ((b0 & 0xf0) == 0xe0 && i + 2 < n) {
        cp = ((b0 & 0x0f) << 12) | ((text.getByte(i + 1) & 0x3f) << 6) |
          (text.getByte(i + 2) & 0x3f)
        i += 3
      } else if ((b0 & 0xf8) == 0xf0 && i + 3 < n) {
        cp = ((b0 & 0x07) << 18) | ((text.getByte(i + 1) & 0x3f) << 12) |
          ((text.getByte(i + 2) & 0x3f) << 6) | (text.getByte(i + 3) & 0x3f)
        i += 4
      } else {
        cp = 0xfffd // invalid/truncated sequence: one 'other', step 1
        i += 1
      }
      counts(clsOf(cp)) += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    countsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sc", this, classOf[ScriptCounts].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countsOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): ScriptCounts =
    copy(child = newChild)
}

object ScriptCounts {
  val ClassNames: Seq[String] =
    Seq("ascii_letter", "digit", "whitespace", "latin_ext", "cyrillic",
      "cjk", "other")

  def apply(text: Column): Column =
    ColumnBridge.column(ScriptCounts(ColumnBridge.expressionEager(text)))
}
