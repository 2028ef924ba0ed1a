package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count ALL (including overlapping) occurrences of every pattern in a
  * fixed dictionary, in ONE pass over the text — the Aho-Corasick
  * automaton as a tier-(b) native expression. This is dictionary
  * tagging / phrase-blocklist scanning: the token-equality blocklists
  * ([[graft.operators.Curation.blocklistFilter]]) can't see multi-word
  * phrases or intra-token substrings, and scanning per-pattern
  * (`instr`/regex per dictionary entry) re-reads the corpus |dict|
  * times — the exact cost AC exists to kill. One automaton walk is
  * O(bytes + matches) regardless of dictionary size.
  *
  * The automaton is built ONCE per deserialized expression instance
  * (driver builds it for interpreted eval; each executor builds it on
  * first use from the serialized pattern list — O(total pattern bytes ×
  * 256) table memory, the classic dense-DFA trade), then shipped into
  * generated code as a reference object: the per-row work inside
  * whole-stage codegen is the byte walk alone, zero allocation beyond
  * the counts array.
  *
  * Matching is per-UTF-8-byte (patterns and text compared as raw
  * bytes — for ASCII identical to per-character). Occurrences are
  * counted at every match END position, so self-overlapping patterns
  * count each overlap ("aa" occurs twice in "aaa") — the definitional
  * substring-occurrence count an oracle replays with a position scan.
  * Returns one count per pattern, in pattern order; null text ⇒ null.
  */
case class MultiMatchCount(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "patterns must be non-empty")
  require(patterns.forall(_.nonEmpty), "empty pattern not allowed")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "multi_match_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_match_count requires string, got ${child.dataType}")

  @transient private lazy val ac =
    AhoCorasick.build(patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** Single entry for interpreted eval AND generated code (reference
    * object call) — builds nothing per row.
    */
  def countMatches(text: UTF8String): ArrayData =
    new GenericArrayData(ac.countAll(text))

  override def nullSafeEval(input: Any): Any =
    countMatches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mmc", this, classOf[MultiMatchCount].getName)
    defineCodeGen(ctx, ev, c => s"$ref.countMatches($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatchCount =
    copy(child = newChild)
}

object MultiMatchCount {
  def apply(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiMatchCount(
      ColumnBridge.expressionEager(text), patterns))
}

/** [[MultiMatchCount]]'s span-extraction sibling: the same one-pass
  * automaton walk, emitting every match as (pattern index, 1-based
  * byte start position, 1-based CHARACTER start position) — what a
  * redaction/PII-audit pipeline consumes (count tells you HOW MUCH;
  * positions tell you WHERE to cut). The byte start `s` is the raw
  * match unit (offset-exact for byte-domain consumers); the character
  * start `cs` is what `substring()`/`substr` cut at — identical to `s`
  * on ASCII, diverging on multi-byte text, where cutting at the byte
  * offset would split a codepoint (the walk carries a codepoint
  * counter beside the byte cursor — [[AhoCorasick.matchEndsWithChars]]
  * — so `cs` costs no second decode pass). Matches are sorted
  * (byte position, pattern index) for deterministic output;
  * overlapping and nested matches all emit, same match-end semantics
  * as the counter. Null text ⇒ null.
  */
case class MultiMatchPositions(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "patterns must be non-empty")
  require(patterns.forall(_.nonEmpty), "empty pattern not allowed")

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("s", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cs", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "multi_match_positions"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_match_positions requires string, got ${child.dataType}")

  @transient private lazy val patBytes =
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  @transient private lazy val patChars =
    patterns.map(p => p.codePointCount(0, p.length))

  @transient private lazy val ac = AhoCorasick.build(patBytes)

  def positionsOf(text: UTF8String): ArrayData = {
    val ends = ac.matchEndsWithChars(text)
    val sorted = ends.map { case (p, e, ce) =>
      // 1-based starts = 0-based end − len + 2, in each unit's own
      // length (bytes for s, codepoints for cs — the oracle's substr
      // scan is the character form)
      (e - patBytes(p).length + 2L, p, ce - patChars(p) + 2L)
    }.sortBy(t => (t._1, t._2))
    new GenericArrayData(sorted.map { case (s, p, cs) =>
      org.apache.spark.sql.catalyst.InternalRow(p, s, cs)
    }.toArray[Any])
  }

  override def nullSafeEval(input: Any): Any =
    positionsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mmp", this, classOf[MultiMatchPositions].getName)
    defineCodeGen(ctx, ev, c => s"$ref.positionsOf($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatchPositions =
    copy(child = newChild)
}

object MultiMatchPositions {
  def apply(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiMatchPositions(
      ColumnBridge.expressionEager(text), patterns))
}

/** Dictionary REDACTION in the same one-pass walk: every byte covered
  * by at least one pattern match is replaced with `*`. Union-of-spans
  * masking is deliberately the semantics — it is ORDER-INDEPENDENT
  * (no leftmost-longest policy to tie-break, overlapping and nested
  * matches just union), which is both what a PII scrubber wants
  * (nothing a pattern matched survives) and what makes the operation
  * exactly replayable by an oracle's position scan. Masking is
  * per-BYTE (the match unit); patterns that end inside a multi-byte
  * code point mask its bytes — ASCII-safe, and for non-ASCII
  * dictionaries the mask unit is still well-defined bytes. Null ⇒
  * null; text without matches passes through unchanged (same buffer,
  * zero copy).
  */
case class MultiMatchRedact(child: Expression, patterns: Seq[String])
    extends UnaryExpression {
  require(patterns.nonEmpty, "patterns must be non-empty")
  require(patterns.forall(_.nonEmpty), "empty pattern not allowed")

  override def dataType: DataType = StringType
  override def prettyName: String = "multi_match_redact"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"multi_match_redact requires string, got ${child.dataType}")

  @transient private lazy val patBytes =
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  @transient private lazy val ac = AhoCorasick.build(patBytes)

  def redact(text: UTF8String): UTF8String = {
    val ends = ac.matchEnds(text)
    if (ends.isEmpty) return text
    // copy byte-by-byte off the UTF8String: exactly ONE allocation
    // (getBytes may itself copy for offset-backed strings — the common
    // UnsafeRow case — and cloning that would double the per-row cost)
    val n = text.numBytes
    val bytes = new Array[Byte](n)
    var b = 0
    while (b < n) { bytes(b) = text.getByte(b); b += 1 }
    var i = 0
    while (i < ends.length) {
      val (p, e) = ends(i)
      var j = e - patBytes(p).length + 1
      while (j <= e) {
        bytes(j) = '*'
        j += 1
      }
      i += 1
    }
    UTF8String.fromBytes(bytes)
  }

  override def nullSafeEval(input: Any): Any =
    redact(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mmr", this, classOf[MultiMatchRedact].getName)
    defineCodeGen(ctx, ev, c => s"$ref.redact($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiMatchRedact =
    copy(child = newChild)
}

object MultiMatchRedact {
  def apply(text: Column, patterns: Seq[String]): Column =
    ColumnBridge.column(MultiMatchRedact(
      ColumnBridge.expressionEager(text), patterns))
}

/** Dense-DFA Aho-Corasick over bytes: `next` is the goto function with
  * fail transitions pre-resolved (O(1) per input byte, no fail-chain
  * walking at match time), `outs` the per-state list of pattern
  * indices ending there (fail-chain outputs merged at build time).
  */
final class AhoCorasick(next: Array[Array[Int]], outs: Array[Array[Int]],
                        numPatterns: Int) extends Serializable {

  def countAll(text: UTF8String): Array[Long] = {
    val counts = new Array[Long](numPatterns)
    val n = text.numBytes
    var state = 0
    var i = 0
    while (i < n) {
      state = next(state)(text.getByte(i) & 0xff)
      val out = outs(state)
      var j = 0
      while (j < out.length) {
        counts(out(j)) += 1
        j += 1
      }
      i += 1
    }
    counts
  }

  /** Every match as (pattern index, 0-based END byte index). */
  def matchEnds(text: UTF8String): scala.collection.mutable.ArrayBuffer[(Int, Int)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val n = text.numBytes
    var state = 0
    var i = 0
    while (i < n) {
      state = next(state)(text.getByte(i) & 0xff)
      val out = outs(state)
      var j = 0
      while (j < out.length) {
        buf += ((out(j), i))
        j += 1
      }
      i += 1
    }
    buf
  }

  /** Every match as (pattern index, 0-based END byte index, 0-based END
    * CHARACTER index) — the same single walk carrying a codepoint
    * counter alongside the byte cursor (a byte starts a codepoint iff
    * it is not a UTF-8 continuation byte, `(b & 0xC0) != 0x80`), so
    * character offsets cost O(1) per byte, not a second decode pass.
    * For valid UTF-8 every match is codepoint-aligned (a pattern's
    * first byte is a lead byte and can only match a lead byte), so the
    * end character index is exactly the index of the match's last
    * codepoint — what a `substring()` consumer needs where byte
    * offsets would cut multi-byte text mid-codepoint.
    */
  def matchEndsWithChars(
      text: UTF8String): scala.collection.mutable.ArrayBuffer[(Int, Int, Int)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
    val n = text.numBytes
    var state = 0
    var i = 0
    var chars = 0 // codepoint starts seen so far
    while (i < n) {
      val b = text.getByte(i)
      if ((b & 0xc0) != 0x80) chars += 1
      state = next(state)(b & 0xff)
      val out = outs(state)
      var j = 0
      while (j < out.length) {
        buf += ((out(j), i, chars - 1))
        j += 1
      }
      i += 1
    }
    buf
  }
}

object AhoCorasick {

  def build(patterns: Seq[Array[Byte]]): AhoCorasick = {
    val maxNodes = patterns.map(_.length).sum + 1
    val children = Array.fill(maxNodes)(Array.fill(256)(-1))
    val outLists = Array.fill(maxNodes)(List.empty[Int])
    var nNodes = 1
    // trie
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var node = 0
      var i = 0
      while (i < p.length) {
        val b = p(i) & 0xff
        if (children(node)(b) < 0) {
          children(node)(b) = nNodes
          nNodes += 1
        }
        node = children(node)(b)
        i += 1
      }
      outLists(node) = idx :: outLists(node)
    }
    // BFS: fail links, fail-resolved goto, merged outputs
    val fail = new Array[Int](nNodes)
    val next = Array.fill(nNodes)(new Array[Int](256))
    val queue = scala.collection.mutable.Queue.empty[Int]
    var b = 0
    while (b < 256) {
      val c = children(0)(b)
      next(0)(b) = if (c < 0) 0 else c
      if (c >= 0) { fail(c) = 0; queue.enqueue(c) }
      b += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outLists(u) = outLists(u) ::: outLists(fail(u))
      var b2 = 0
      while (b2 < 256) {
        val c = children(u)(b2)
        if (c >= 0) {
          fail(c) = next(fail(u))(b2)
          next(u)(b2) = c
          queue.enqueue(c)
        } else {
          next(u)(b2) = next(fail(u))(b2)
        }
        b2 += 1
      }
    }
    new AhoCorasick(next.take(nNodes),
      outLists.take(nNodes).map(_.toArray), patterns.length)
  }
}
