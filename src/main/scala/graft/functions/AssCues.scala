package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ASS/SSA subtitle parsing — [[SubtitleCues]]'s sibling for the
  * format fansub and anime video corpora predominantly ship
  * (Advanced SubStation Alpha; the public spec is the TCax/Aegisub
  * documentation): a `[Script Info]` header, then an `[Events]`
  * section whose `Format:` line DECLARES the field order of the
  * `Dialogue:` lines that follow (real files reorder fields — a
  * fixed-position parse is wrong; this one resolves Layer / Start /
  * End / Style / Name / Text positions from the declaration, with
  * the V4 `Marked=N` spelling accepted for Layer). `Text` is always
  * LAST and commas inside it are literal, so splitting caps at the
  * declared field count.
  *
  * Timecodes are `H:MM:SS.cc` CENTISECONDS (→ ms ×10). Cue text:
  * `{\...}` override tags strip, `\N`/`\n` become newlines, `\h`
  * a space. `Comment:`/`Picture:`/`Sound:` event lines and every
  * other section (`[V4+ Styles]`, fonts/graphics) are skipped.
  *
  * Output: one `(layer, style, speaker, start_ms, end_ms, text)` row
  * per Dialogue event, file order. FAIL-CLOSED NULL for: no
  * `[Events]` Format declaration ahead of a Dialogue line, a Format
  * without Start/End/Text, unparseable timecodes, `end < start`,
  * more than `maxCues` events. An [Events]-less script yields an
  * EMPTY array — stylesheet-only files are not corruption. */
case class AssCues(child: Expression, maxCues: Int)
    extends UnaryExpression {
  require(maxCues > 0, "cue bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ass_cues expects string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("layer", IntegerType, nullable = false),
    StructField("style", StringType, nullable = false),
    StructField("speaker", StringType, nullable = true),
    StructField("start_ms", LongType, nullable = false),
    StructField("end_ms", LongType, nullable = false),
    StructField("text", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    AssCues.compute(a.asInstanceOf[UTF8String].toString, maxCues)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AssCues.compute($c.toString(), $maxCues);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ass_cues"
}

object AssCues {

  private case object Bad extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  /** `H:MM:SS.cc` (hours may run over one digit) → ms, or -1. */
  private def time(s: String): Long = {
    val t = s.trim
    val m = "^(\\d{1,2}):(\\d{1,2}):(\\d{1,2})\\.(\\d{2})$".r
      .findFirstMatchIn(t).orNull
    if (m == null) return -1L
    val mm = m.group(2).toLong
    val ss = m.group(3).toLong
    if (mm > 59 || ss > 59) return -1L
    ((m.group(1).toLong * 60 + mm) * 60 + ss) * 1000 + m.group(4).toLong * 10
  }

  /** Strip `{...}` override blocks; `\N`/`\n` → newline, `\h` → space. */
  private def cleanText(raw: String): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '{') {
        val close = raw.indexOf('}', i + 1)
        if (close < 0) i = raw.length // unterminated tag: drop the rest
        else i = close + 1
      } else if (c == '\\' && i + 1 < raw.length) {
        raw.charAt(i + 1) match {
          case 'N' | 'n' => sb.append('\n'); i += 2
          case 'h' => sb.append(' '); i += 2
          case other => sb.append(c); sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(s: String, maxCues: Int): GenericArrayData = {
    try {
      if (s == null) return null
      // fields of the active [Events] Format declaration, lowercased
      var fields: Array[String] = null
      var inEvents = false
      val out = new scala.collection.mutable.ArrayBuffer[GenericInternalRow]
      for (line0 <- s.split("\r\n|\n|\r", -1)) {
        val line = line0.trim
        if (line.startsWith("[")) {
          inEvents = line.equalsIgnoreCase("[Events]")
          if (!inEvents) fields = null
        } else if (inEvents && line.regionMatches(true, 0, "Format:", 0, 7)) {
          fields = line.substring(7).split(",").map(_.trim.toLowerCase)
          if (!fields.contains("start") || !fields.contains("end") ||
            !fields.contains("text")) throw Bad
          if (fields.last != "text") throw Bad // commas in text are literal
        } else if (inEvents &&
          line.regionMatches(true, 0, "Dialogue:", 0, 9)) {
          if (fields == null) throw Bad // Dialogue before its Format
          if (out.size >= maxCues) throw Bad
          val vals = line.substring(9).split(",", fields.length)
          if (vals.length < fields.length) throw Bad
          def get(name: String): String = {
            val i = fields.indexOf(name)
            if (i < 0) null else vals(i).trim
          }
          val start = time(get("start"))
          val end = time(get("end"))
          if (start < 0 || end < 0 || end < start) throw Bad
          // V4 SSA spells the first field "Marked=N"; V4+ "Layer"
          val layer = {
            val l = get("layer")
            if (l != null && l.forall(_.isDigit) && l.nonEmpty) l.toInt
            else {
              val mk = get("marked")
              if (mk != null && mk.regionMatches(true, 0, "Marked=", 0, 7))
                mk.substring(7).trim.toInt
              else 0
            }
          }
          val style = { val v = get("style"); if (v == null) "" else v }
          val speaker = { val v = get("name"); if (v == null || v.isEmpty)
            null else UTF8String.fromString(v) }
          val rawText = vals(fields.length - 1) // verbatim, NOT trimmed
          out += new GenericInternalRow(Array[Any](
            layer, UTF8String.fromString(style), speaker,
            start, end, UTF8String.fromString(cleanText(rawText))))
        }
        // Comment:/Picture:/Sound:/other lines skip silently
      }
      new GenericArrayData(out.toArray[Any])
    } catch {
      case Bad => null
      case _: NumberFormatException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; default cue bound 64k. */
  def apply(payload: Column, maxCues: Int = 1 << 16): Column =
    ColumnShim.column(AssCues(ColumnShim.expression(payload), maxCues))
}
