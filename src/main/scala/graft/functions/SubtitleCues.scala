package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SRT / WebVTT subtitle parsing — the caption tier an ASR or
  * video-text corpus onboards (YouTube community captions, OpenSubs
  * dumps, TV archives ship exactly these two formats): one pass over
  * the text yields `(cue_id, start_ms, end_ms, text)` per cue.
  *
  * Format auto-detected: a `WEBVTT` first line (BOM tolerated,
  * trailing header text allowed) parses as VTT — `NOTE` / `STYLE` /
  * `REGION` blocks skipped whole, optional cue-identifier lines kept
  * as `cue_id`, hours optional in timestamps (`MM:SS.mmm`), cue
  * settings after the timing line ignored, inline markup tags
  * (`<i>`, `<c.color>`, `<00:00:01.000>` karaoke stamps) stripped.
  * Anything else parses as SRT — numeric index lines become `cue_id`,
  * timestamps use the comma decimal (dot tolerated — real-world SRT
  * is sloppy), the same tag strip applies. CRLF normalizes; cue text
  * lines join with `\n`.
  *
  * FAIL-CLOSED NULL for: a malformed timing line (a cue block whose
  * second line carries `-->` but does not parse), `end < start`,
  * more than `maxCues` cues. A header-only VTT or whitespace-only
  * input yields an EMPTY array — no cues is not corruption. */
case class SubtitleCues(child: Expression, maxCues: Int)
    extends UnaryExpression {
  require(maxCues > 0, "cue bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"subtitle_cues expects string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("cue_id", StringType, nullable = true),
    StructField("start_ms", LongType, nullable = false),
    StructField("end_ms", LongType, nullable = false),
    StructField("text", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    SubtitleCues.compute(a.asInstanceOf[UTF8String].toString, maxCues)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.SubtitleCues.compute($c.toString(), $maxCues);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "subtitle_cues"
}

object SubtitleCues {

  private case object Bad extends Exception { override def fillInStackTrace(): Throwable = this }

  private val Timing =
    ("^(?:(\\d{1,3}):)?(\\d{1,2}):(\\d{1,2})[.,](\\d{3})" +
      "\\s*-->\\s*" +
      "(?:(\\d{1,3}):)?(\\d{1,2}):(\\d{1,2})[.,](\\d{3})(?:\\s.*)?$").r

  /** The per-row kernel — public static so generated code can call it. */
  def compute(s: String, maxCues: Int): GenericArrayData = {
    try {
      if (s == null) return null
      val body = s.stripPrefix("\uFEFF").replace("\r\n", "\n")
        .replace("\r", "\n")
      val lines = body.split("\n", -1)
      val isVtt = lines.nonEmpty && lines(0).startsWith("WEBVTT")
      val out = new java.util.ArrayList[Any]
      var i = if (isVtt) 1 else 0
      while (i < lines.length) {
        // skip blank separators
        while (i < lines.length && lines(i).trim.isEmpty) i += 1
        if (i < lines.length) {
          val first = lines(i)
          if (isVtt && (first.startsWith("NOTE") ||
            first.startsWith("STYLE") || first.startsWith("REGION"))) {
            while (i < lines.length && lines(i).trim.nonEmpty) i += 1
          } else {
            // optional id line, then the timing line
            var cueId: String = null
            var timing = first
            if (!first.contains("-->")) {
              if (i + 1 >= lines.length || !lines(i + 1).contains("-->"))
                throw Bad
              cueId = first.trim
              i += 1
              timing = lines(i)
            }
            val (st, en) = timing.trim match {
              case Timing(h1, m1, s1, ms1, h2, m2, s2, ms2) =>
                (ms(h1, m1, s1, ms1), ms(h2, m2, s2, ms2))
              case _ => throw Bad
            }
            if (en < st) throw Bad
            i += 1
            val sb = new StringBuilder
            while (i < lines.length && lines(i).trim.nonEmpty) {
              if (sb.nonEmpty) sb.append('\n')
              sb.append(lines(i))
              i += 1
            }
            val text = sb.toString.replaceAll("<[^>]*>", "")
            if (out.size() >= maxCues) throw Bad
            out.add(new GenericInternalRow(Array[Any](
              if (cueId == null) null else UTF8String.fromString(cueId),
              st, en, UTF8String.fromString(text))))
          }
        }
      }
      new GenericArrayData(out.toArray)
    } catch {
      case Bad => null
    }
  }

  private def ms(h: String, m: String, s: String, frac: String): Long = {
    val hh = if (h == null) 0L else h.toLong
    val mm = m.toLong
    val ss = s.toLong
    if (mm > 59 || ss > 59) throw Bad
    ((hh * 60 + mm) * 60 + ss) * 1000 + frac.toLong
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 65536-cue default bound. */
  def apply(text: Column, maxCues: Int = 1 << 16): Column =
    ColumnShim.column(SubtitleCues(ColumnShim.expression(text), maxCues))
}
