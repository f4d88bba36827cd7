package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro Object Container File BLOCK census — [[AvroSchemaJson]]'s
  * sibling for the numbers a lake audit wants without decoding a
  * single datum: every OCF data block is `(record-count zigzag
  * varint, byte-size varint, data, 16-byte sync marker)`, so the
  * EXACT row count, block count and payload bytes read straight off
  * the block framing regardless of codec — the avro counterpart of
  * [[ParquetFooterMeta]]'s `num_rows` (avro keeps its counts inline
  * rather than in a footer).
  *
  * Output struct: `(codec, n_blocks, n_records, data_bytes)` —
  * codec from `avro.codec` (`null` per the spec when absent).
  *
  * FAIL-CLOSED NULL on: missing magic, malformed varints, negative
  * counts/sizes, a block running past the buffer, a sync marker that
  * does not match the header's (the spec's corruption tripwire), or
  * trailing bytes that are not a whole block. Data bytes are only
  * SKIPPED, never decoded. Per-row bounded work, zero shuffle,
  * codegen'd. */
case class AvroBlocks(child: Expression, maxBlocks: Int)
    extends UnaryExpression {
  require(maxBlocks > 0, "block bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"avro_blocks expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("codec", StringType, nullable = false),
    StructField("n_blocks", LongType, nullable = false),
    StructField("n_records", LongType, nullable = false),
    StructField("data_bytes", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    AvroBlocks.compute(a.asInstanceOf[Array[Byte]], maxBlocks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AvroBlocks.compute($c, $maxBlocks);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "avro_blocks"
}

object AvroBlocks {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], maxBlocks: Int): InternalRow = {
    val n = bytes.length
    if (n < 5 || bytes(0) != 'O' || bytes(1) != 'b' || bytes(2) != 'j' ||
      bytes(3) != 1) return null
    var pos = 4
    def varint(): Long = {
      var acc = 0L
      var shift = 0
      var more = true
      while (more) {
        if (pos >= n || shift > 63) throw Bad
        val b = bytes(pos) & 0xff
        pos += 1
        acc |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      (acc >>> 1) ^ -(acc & 1L) // zigzag decode
    }
    try {
      // header metadata map: only avro.codec is read, the rest skips
      var codec = "null" // the spec's default when the key is absent
      var mapCount = varint()
      var guard = 0
      while (mapCount != 0) {
        guard += 1
        if (guard > 64) throw Bad
        if (mapCount < 0) { varint(); mapCount = -mapCount }
        var i = 0L
        while (i < mapCount) {
          val klen = varint()
          if (klen < 0 || pos + klen > n) throw Bad
          val key = new String(bytes, pos, klen.toInt,
            java.nio.charset.StandardCharsets.UTF_8)
          pos += klen.toInt
          val vlen = varint()
          if (vlen < 0 || pos + vlen > n) throw Bad
          if (key == "avro.codec")
            codec = new String(bytes, pos, vlen.toInt,
              java.nio.charset.StandardCharsets.UTF_8)
          pos += vlen.toInt
          i += 1
        }
        mapCount = varint()
      }
      if (pos + 16 > n) throw Bad
      val syncAt = pos
      pos += 16
      // the block chain must tile the remainder exactly
      var nBlocks = 0L
      var nRecords = 0L
      var dataBytes = 0L
      while (pos < n) {
        if (nBlocks >= maxBlocks) throw Bad
        val cnt = varint()
        val size = varint()
        if (cnt < 0 || size < 0 || pos + size + 16 > n) throw Bad
        pos += size.toInt
        var j = 0
        while (j < 16) {
          if (bytes(pos + j) != bytes(syncAt + j)) throw Bad
          j += 1
        }
        pos += 16
        nBlocks += 1
        nRecords += cnt
        dataBytes += size
      }
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(codec), nBlocks, nRecords, dataBytes))
    } catch {
      case Bad => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; at most 1M blocks by default. */
  def apply(payload: Column, maxBlocks: Int = 1 << 20): Column =
    ColumnShim.column(AvroBlocks(ColumnShim.expression(payload), maxBlocks))
}
