package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Script-aware tokenizer: [[WsTokens]]' space splitting PLUS a
  * per-codepoint fallback for scripts that do not separate words with
  * spaces (Han, Hiragana, Katakana, Hangul, Thai, Lao, Khmer,
  * Myanmar). A CJK/Thai document is ONE token to a whitespace
  * tokenizer — which silently breaks every token-family operator
  * (vocab, BM25, LMs, token budgets) and turns CJK prose into
  * "high-entropy secrets" (many distinct chars ⇒ n·H ≈ n·ln n). This
  * kernel emits each no-space-script codepoint as its own token —
  * the standard character-level fallback (the CJK unigram convention
  * of mBERT/CLD) — while space-separated runs of every other script
  * tokenize exactly as [[WsTokens]]: **on space-script text the two
  * kernels are byte-identical**, so the fallback is opt-in per
  * operator without disturbing any existing contract.
  *
  * `"abc漢字 def"` → `["abc", "漢", "字", "def"]`.
  *
  * One compiled pass over the UTF-8 bytes (lead-byte decode, no
  * regex); null input ⇒ null; empty/all-space ⇒ empty array. */
case class ScriptTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"script_tokens expects string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    ScriptTokens.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ScriptTokens.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "script_tokens"
}

object ScriptTokens {

  /** No-space-script codepoint ranges (Unicode 15 block boundaries):
    * scripts whose orthography has no word spaces, tokenized
    * per-codepoint. Sorted, non-overlapping. */
  private val ranges: Array[(Int, Int)] = Array(
    (0x0E00, 0x0E7F),   // Thai
    (0x0E80, 0x0EFF),   // Lao
    (0x1000, 0x109F),   // Myanmar
    (0x1100, 0x11FF),   // Hangul Jamo
    (0x1780, 0x17FF),   // Khmer
    (0x3040, 0x309F),   // Hiragana
    (0x30A0, 0x30FF),   // Katakana
    (0x3130, 0x318F),   // Hangul Compatibility Jamo
    (0x31F0, 0x31FF),   // Katakana Phonetic Extensions
    (0x3400, 0x4DBF),   // CJK Ideographs Extension A
    (0x4E00, 0x9FFF),   // CJK Unified Ideographs
    (0xAC00, 0xD7AF),   // Hangul Syllables
    (0xF900, 0xFAFF),   // CJK Compatibility Ideographs
    (0x20000, 0x2FA1F)) // CJK Ideographs Extensions B..F

  /** Is this codepoint in a no-space script? Branchless-ish linear
    * scan over 14 ranges — cheap next to the UTF-8 decode itself,
    * and the common case (ASCII < 0x0E00) exits on the first probe. */
  def isNoSpaceScript(cp: Int): Boolean = {
    if (cp < 0x0E00) return false
    var i = 0
    while (i < ranges.length) {
      if (cp < ranges(i)._1) return false
      if (cp <= ranges(i)._2) return true
      i += 1
    }
    false
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Any]
    var start = 0
    def flush(end: Int): Unit =
      if (end > start)
        out.add(UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, end)))
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      if (b == ' '.toInt) {
        flush(i); start = i + 1; i += 1
      } else if (b < 0x80) {
        i += 1
      } else {
        // UTF-8 lead byte → codepoint + length (input is valid UTF-8:
        // Spark strings are; a truncated tail decodes conservatively)
        val len = if (b >= 0xF0) 4 else if (b >= 0xE0) 3 else 2
        if (i + len > n) { i = n } // malformed tail: keep in token
        else {
          var cp = b & (0xFF >> (len + 1))
          var k = 1
          while (k < len) { cp = (cp << 6) | (bytes(i + k) & 0x3F); k += 1 }
          if (isNoSpaceScript(cp)) {
            flush(i)
            out.add(UTF8String.fromBytes(
              java.util.Arrays.copyOfRange(bytes, i, i + len)))
            start = i + len
          }
          i += len
        }
      }
    }
    flush(n)
    new GenericArrayData(out.toArray)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(text: Column): Column =
    ColumnShim.column(ScriptTokens(ColumnShim.expression(text)))
}
