package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair — the ftfy core case every web crawl hits: text
  * that was UTF-8 ENCODED but then DECODED as Windows-1252/Latin-1
  * somewhere in the pipeline ("café" shipped as "cafÃ©", "€" as
  * "â‚¬"), sometimes twice ("cafÃƒÂ©"). The repair inverts the
  * mis-decode: map each char back to its CP1252 byte, strictly decode
  * the bytes as UTF-8, and keep the result only when the decode is
  * VALID and strictly shorter (a multi-byte sequence actually
  * collapsed) — genuine Latin-1/CP1252 prose fails the strict decode
  * and passes through byte-identical, as does all-ASCII text (the
  * 99% fast path: one scan, no allocation). Up to two rounds unwinds
  * double-encoding; the round count is emitted by
  * [[FixMojibake.rounds]]' sibling expression for audit queries.
  *
  * Deterministic, in-row, zero shuffle — crawl-scan speed. Strictness
  * notes: chars with no CP1252 byte (anything ≥ U+0100 outside the
  * 27 CP1252 specials) abort the repair; C1 controls map back to
  * their own byte ("sloppy CP1252", ftfy's convention — they are what
  * decoders emit for the five unmapped CP1252 bytes); overlong/
  * surrogate/past-U+10FFFF UTF-8 forms are rejected by the strict
  * decoder. */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fix_mojibake expects string input, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(a: Any): Any =
    FixMojibake.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FixMojibake.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "fix_mojibake"
}

object FixMojibake {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(text: Column): Column =
    ColumnShim.column(FixMojibake(ColumnShim.expression(text)))

  /** CP1252's 0x80–0x9F block (the only place it differs from
    * Latin-1): codepoint per byte, 0 = unmapped byte (81 8D 8F 90 9D). */
  private val cp1252Hi: Array[Int] = Array(
    0x20AC, 0, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0, 0x017D, 0,
    0, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0, 0x017E, 0x0178)

  /** codepoint → CP1252 byte (0–255), or -1 when unrepresentable. */
  private val inv: java.util.HashMap[Integer, Integer] = {
    val m = new java.util.HashMap[Integer, Integer]()
    var b = 0
    while (b < 32) {
      if (cp1252Hi(b) != 0) m.put(cp1252Hi(b), 0x80 + b)
      b += 1
    }
    m
  }

  private def toCp1252Byte(cp: Int): Int =
    if (cp < 0x80) cp
    else if (cp >= 0xA0 && cp <= 0xFF) cp
    // "sloppy CP1252" (ftfy's convention): a C1 control is what a
    // decoder emits for the five unmapped CP1252 bytes — map it back
    // to its own byte value so those bytes survive the roundtrip.
    else if (cp >= 0x80 && cp < 0xA0) cp
    else { val v = inv.get(cp); if (v == null) -1 else v.intValue() }

  /** One unwind round: chars → CP1252 bytes → strict UTF-8 decode.
    * Null when any char has no byte, the decode is invalid, or
    * nothing collapsed (no multi-byte sequence present). */
  private def unwind(s: String): String = {
    val n = s.length
    val bytes = new Array[Byte](n) // codepoints > 0xFFFF are unmappable anyway
    var i = 0
    var j = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val b = toCp1252Byte(cp)
      if (b < 0) return null
      bytes(j) = b.toByte
      j += 1
      i += Character.charCount(cp)
    }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes, 0, j)).toString
      if (out.codePointCount(0, out.length) < j) out else null
    } catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** Repair with round count: (fixed text, rounds applied ∈ {0,1,2}). */
  def repair(s: String): (String, Int) = {
    // fast path: all-ASCII can't be mojibake
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return (s, 0)
    val once = unwind(s)
    if (once == null) return (s, 0)
    val twice = unwind(once)
    if (twice == null) (once, 1) else (twice, 2)
  }

  def compute(text: UTF8String): UTF8String = {
    val (fixed, n) = repair(text.toString)
    if (n == 0) text else UTF8String.fromString(fixed)
  }

  /** Rounds-only variant for audit roll-ups (how much of the corpus
    * was mojibake, and how deep). */
  def computeRounds(text: UTF8String): Int = repair(text.toString)._2
}

/** Companion audit expression: how many unwind rounds
  * [[FixMojibake]] applied (0 = clean or unrepairable, 1 = single
  * mojibake, 2 = double-encoded). */
case class MojibakeRounds(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mojibake_rounds expects string input, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any =
    FixMojibake.computeRounds(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.FixMojibake.computeRounds($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "mojibake_rounds"
}

object MojibakeRounds {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  def apply(text: Column): Column =
    ColumnShim.column(MojibakeRounds(ColumnShim.expression(text)))
}
