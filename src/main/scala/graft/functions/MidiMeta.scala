package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Standard MIDI File census — the symbolic-music tier of a training
  * corpus (MAESTRO/Lakh-class datasets ship millions of `.mid`):
  * `MThd` (format, track count, division) and a full event walk of
  * every `MTrk` — variable-length deltas, RUNNING STATUS, meta /
  * sysex framing — collecting the TEMPO MAP (meta `FF 51 03`) so
  * `duration_ms` integrates ticks→time exactly the way players do:
  * segments between tempo changes at the 500000 µs/qn default,
  * merged across tracks on the shared timebase; SMPTE divisions
  * (negative top byte) convert directly at frames/sec × ticks/frame.
  * Note-on events with velocity > 0 are counted as `n_notes`.
  *
  * FAIL-CLOSED NULL for: bad `MThd`/`MTrk` magics or lengths, a
  * track without its end-of-track meta, a data byte where a status
  * byte is due (running status with none established), event counts
  * past `maxEvents`, divisions of zero. Per-row bounded work, zero
  * shuffle, codegen'd. */
case class MidiMeta(child: Expression, maxEvents: Int)
    extends UnaryExpression {
  require(maxEvents > 0, "event walk bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"midi_meta expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", IntegerType, nullable = false),
    StructField("n_tracks", IntegerType, nullable = false),
    StructField("division", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("n_tempo_changes", IntegerType, nullable = false),
    StructField("n_notes", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    MidiMeta.compute(a.asInstanceOf[Array[Byte]], maxEvents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MidiMeta.compute($c, $maxEvents);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "midi_meta"
}

object MidiMeta {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte], maxEvents: Int): InternalRow = {
    try {
      if (b == null || b.length < 14) return null
      if (!(b(0) == 'M' && b(1) == 'T' && b(2) == 'h' && b(3) == 'd'))
        return null
      if (be32(b, 4) != 6) return null
      val format = be16(b, 8)
      if (format > 2) return null
      val nTracks = be16(b, 10)
      val division = be16(b, 12)
      if (division == 0 || nTracks == 0) return null

      // walk every track: end tick, tempo events, note count
      var pos = 14
      val tempoTicks = new java.util.ArrayList[Long]
      val tempoVals = new java.util.ArrayList[Int]
      var maxTick = 0L
      var notes = 0L
      var events = 0
      var t = 0
      while (t < nTracks) {
        if (pos + 8 > b.length) throw Bad
        if (!(b(pos) == 'M' && b(pos + 1) == 'T' && b(pos + 2) == 'r' &&
          b(pos + 3) == 'k')) throw Bad
        val len = be32(b, pos + 4)
        if (len < 0 || pos + 8 + len > b.length) throw Bad
        var p = pos + 8
        val end = pos + 8 + len
        var tick = 0L
        var running = -1
        var ended = false
        while (!ended) {
          if (p >= end) throw Bad // track without end-of-track
          events += 1
          if (events > maxEvents) throw Bad
          // delta time varint (big-endian 7-bit groups)
          var delta = 0L
          var bb = 0
          var cnt = 0
          do {
            if (p >= end || cnt > 4) throw Bad
            bb = b(p) & 0xff
            delta = (delta << 7) | (bb & 0x7f)
            p += 1
            cnt += 1
          } while ((bb & 0x80) != 0)
          tick += delta
          if (p >= end) throw Bad
          var status = b(p) & 0xff
          if (status >= 0x80) p += 1
          else {
            if (running < 0) throw Bad
            status = running
          }
          if (status == 0xff) { // meta
            if (p + 1 >= end) throw Bad
            val mtype = b(p) & 0xff
            p += 1
            var mlen = 0L
            cnt = 0
            do {
              if (p >= end || cnt > 4) throw Bad
              bb = b(p) & 0xff
              mlen = (mlen << 7) | (bb & 0x7f)
              p += 1
              cnt += 1
            } while ((bb & 0x80) != 0)
            if (p + mlen > end) throw Bad
            if (mtype == 0x2f) ended = true
            else if (mtype == 0x51) {
              if (mlen != 3) throw Bad
              val us = ((b(p) & 0xff) << 16) | ((b(p + 1) & 0xff) << 8) |
                (b(p + 2) & 0xff)
              tempoTicks.add(tick)
              tempoVals.add(us)
            }
            p += mlen.toInt
            running = -1
          } else if (status == 0xf0 || status == 0xf7) { // sysex
            var slen = 0L
            cnt = 0
            do {
              if (p >= end || cnt > 4) throw Bad
              bb = b(p) & 0xff
              slen = (slen << 7) | (bb & 0x7f)
              p += 1
              cnt += 1
            } while ((bb & 0x80) != 0)
            if (p + slen > end) throw Bad
            p += slen.toInt
            running = -1
          } else {
            val hi = status & 0xf0
            if (hi < 0x80) throw Bad
            val nData = if (hi == 0xc0 || hi == 0xd0) 1 else 2
            if (p + nData > end) throw Bad
            if (hi == 0x90 && (b(p + 1) & 0xff) > 0) notes += 1
            p += nData
            running = status
          }
        }
        if (tick > maxTick) maxTick = tick
        pos += 8 + len
        t += 1
      }

      // ticks → milliseconds
      val durMs: Long =
        if ((division & 0x8000) != 0) {
          // SMPTE: -fps frames/sec, ticks/frame
          val fps = -(division >> 8).toByte.toInt
          val tpf = division & 0xff
          if (fps <= 0 || tpf == 0) throw Bad
          maxTick * 1000 / (fps.toLong * tpf)
        } else {
          // sort tempo events by tick (stable across tracks) and
          // integrate; 500000 µs/qn before the first change
          val n = tempoTicks.size()
          val idx = (0 until n).sortBy(i => tempoTicks.get(i))
          var us = 0L
          var lastTick = 0L
          var tempo = 500000L
          for (i <- idx) {
            val tk = math.min(tempoTicks.get(i), maxTick)
            if (tk > lastTick) {
              us += (tk - lastTick) * tempo / division
              lastTick = tk
            }
            tempo = tempoVals.get(i).toLong
          }
          if (maxTick > lastTick)
            us += (maxTick - lastTick) * tempo / division
          us / 1000
        }
      new GenericInternalRow(Array[Any](
        format, nTracks, division, durMs, tempoTicks.size(), notes))
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  private def be16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  private def be32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 1M-event default walk bound. */
  def apply(payload: Column, maxEvents: Int = 1 << 20): Column =
    ColumnShim.column(MidiMeta(ColumnShim.expression(payload), maxEvents))
}
