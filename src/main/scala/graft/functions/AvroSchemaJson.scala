package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro Object Container File schema extraction — the third leg of
  * lake-format schema discovery ([[JsonPathTypes]] censuses JSONL,
  * `csvInferSchema` delimited files; Avro files CARRY their schema):
  * parse the OCF header — magic `Obj\x01`, then the file-metadata
  * map in Avro binary encoding (zigzag-varint block counts, the
  * negative-count + block-size form included, length-prefixed
  * string/bytes pairs) — and return the `avro.schema` value, the
  * JSON an explicit-schema reader feeds straight to the Avro source.
  * Paired with [[graft.ext.Multimodal.sniffFormat]]'s `avro` label:
  * `sniff → avro_schema → read with schema` needs no library probe
  * pass.
  *
  * FAIL-CLOSED NULL on: missing magic, varint running past the
  * buffer or exceeding 10 bytes, negative lengths, any declared
  * length past the buffer or `maxLen`, or a header without
  * `avro.schema`. Only the metadata map is read — data blocks are
  * never touched. Per-row bounded work, zero shuffle, codegen'd. */
case class AvroSchemaJson(child: Expression, maxLen: Int)
    extends UnaryExpression {
  require(maxLen > 0, "length cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"avro_schema expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    AvroSchemaJson.compute(a.asInstanceOf[Array[Byte]], maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AvroSchemaJson.compute($c, $maxLen);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "avro_schema"
}

object AvroSchemaJson {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], maxLen: Int): UTF8String = {
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
      var schema: UTF8String = null
      var blockCount = varint()
      var guard = 0
      while (blockCount != 0) {
        guard += 1
        if (guard > 64) throw Bad // runaway block chain
        if (blockCount < 0) {
          varint() // block byte size — advisory, entries still walked
          blockCount = -blockCount
        }
        var i = 0L
        while (i < blockCount) {
          val klen = varint()
          if (klen < 0 || klen > maxLen || pos + klen > n) throw Bad
          val key = new String(bytes, pos, klen.toInt,
            java.nio.charset.StandardCharsets.UTF_8)
          pos += klen.toInt
          val vlen = varint()
          if (vlen < 0 || vlen > maxLen || pos + vlen > n) throw Bad
          if (key == "avro.schema")
            schema = UTF8String.fromBytes(
              java.util.Arrays.copyOfRange(bytes, pos, pos + vlen.toInt))
          pos += vlen.toInt
          i += 1
        }
        blockCount = varint()
      }
      schema // null when the header carries no avro.schema
    } catch {
      case Bad => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; `maxLen` caps any single metadata
    * key/value at 1 MiB by default (schemas are KB-sized). */
  def apply(payload: Column, maxLen: Int = 1 << 20): Column =
    ColumnShim.column(AvroSchemaJson(ColumnShim.expression(payload), maxLen))
}
