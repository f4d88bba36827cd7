package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parquet FOOTER metadata — the lake-discovery tier for the format
  * data lakes are actually made of: a parquet file ends with
  * `le32(footer_len) + "PAR1"`, and the footer is a Thrift
  * compact-protocol `FileMetaData` struct carrying everything a
  * census needs WITHOUT a table read — version, exact row count,
  * row-group count, writer string, and the full schema tree. This
  * kernel implements the compact protocol from the public wire spec
  * (zigzag varints, delta-coded field ids, typed list headers,
  * recursive struct skip) and walks the `SchemaElement` list into
  * LEAF columns with dotted paths (group nesting resolved via the
  * `num_children` stack), physical type names and repetition labels.
  *
  * Output struct: `(version, num_rows, n_row_groups, created_by,
  * columns array<(path, ptype, repetition)>)` — the discovery row
  * `sniff → parquet_meta → explicit read` starts from, the parquet
  * sibling of `csvInferSchema`/`jsonInferSchema`'s artifacts.
  *
  * FAIL-CLOSED NULL on: missing head/tail magic, footer length past
  * the payload, malformed thrift (bad types, truncated varints,
  * over-deep nesting), or a schema walk that does not consume its
  * element list exactly. Unknown/extra thrift fields are SKIPPED
  * generically (forward-compatible, the thrift way). Per-row bounded
  * work, zero shuffle, codegen'd. */
case class ParquetFooterMeta(child: Expression, maxColumns: Int)
    extends UnaryExpression {
  require(maxColumns > 0, "column walk bound must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"parquet_meta expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("num_rows", LongType, nullable = false),
    StructField("n_row_groups", IntegerType, nullable = false),
    StructField("created_by", StringType, nullable = true),
    StructField("columns", ArrayType(StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("ptype", StringType, nullable = false),
      StructField("repetition", StringType, nullable = false))),
      containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    ParquetFooterMeta.compute(a.asInstanceOf[Array[Byte]], maxColumns)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ParquetFooterMeta.compute($c, $maxColumns);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "parquet_meta"
}

object ParquetFooterMeta {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  // thrift compact wire types
  private final val TStop = 0
  private final val TTrue = 1
  private final val TFalse = 2
  private final val TByte = 3
  private final val TI16 = 4
  private final val TI32 = 5
  private final val TI64 = 6
  private final val TDouble = 7
  private final val TBinary = 8
  private final val TList = 9
  private final val TSet = 10
  private final val TMap = 11
  private final val TStruct = 12

  private final class Reader(bytes: Array[Byte], var pos: Int,
                             val end: Int) {
    def u8(): Int = {
      if (pos >= end) throw Bad
      val b = bytes(pos) & 0xff
      pos += 1
      b
    }
    def varint(): Long = {
      var v = 0L
      var shift = 0
      var b = 0
      do {
        if (shift > 63) throw Bad
        b = u8()
        v |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      v
    }
    def zigzag(): Long = { val n = varint(); (n >>> 1) ^ -(n & 1L) }
    def skipBytes(n: Long): Unit = {
      if (n < 0 || pos + n > end) throw Bad
      pos += n.toInt
    }
    def string(): String = {
      val len = varint()
      if (len < 0 || pos + len > end) throw Bad
      val s = new String(bytes, pos, len.toInt,
        java.nio.charset.StandardCharsets.UTF_8)
      pos += len.toInt
      s
    }
  }

  /** Generic compact-protocol value skip (forward compatibility). */
  private def skipValue(r: Reader, tpe: Int, depth: Int): Unit = {
    if (depth > 32) throw Bad
    tpe match {
      case TTrue | TFalse => () // value lives in the field header
      case TByte => r.skipBytes(1)
      case TI16 | TI32 | TI64 => r.varint(); ()
      case TDouble => r.skipBytes(8)
      case TBinary => r.skipBytes(r.varint())
      case TList | TSet =>
        val h = r.u8()
        val et = h & 0x0f
        var n = (h >> 4) & 0x0f
        if (n == 15) n = r.varint().toInt
        if (n < 0) throw Bad
        var i = 0
        while (i < n) {
          // bools inside containers are 1-byte values
          if (et == TTrue || et == TFalse) r.skipBytes(1)
          else skipValue(r, et, depth + 1)
          i += 1
        }
      case TMap =>
        val n = r.varint().toInt
        if (n < 0) throw Bad
        if (n > 0) {
          val kv = r.u8()
          val kt = (kv >> 4) & 0x0f
          val vt = kv & 0x0f
          var i = 0
          while (i < n) {
            if (kt == TTrue || kt == TFalse) r.skipBytes(1)
            else skipValue(r, kt, depth + 1)
            if (vt == TTrue || vt == TFalse) r.skipBytes(1)
            else skipValue(r, vt, depth + 1)
            i += 1
          }
        }
      case TStruct =>
        var lastFid = 0
        var done = false
        while (!done) {
          val h = r.u8()
          if (h == TStop) done = true
          else {
            val t = h & 0x0f
            val delta = (h >> 4) & 0x0f
            lastFid = if (delta == 0) r.zigzag().toInt else lastFid + delta
            skipValue(r, t, depth + 1)
          }
        }
      case _ => throw Bad
    }
  }

  /** One list header → (elemType, count). */
  private def listHeader(r: Reader): (Int, Int) = {
    val h = r.u8()
    var n = (h >> 4) & 0x0f
    if (n == 15) n = r.varint().toInt
    if (n < 0) throw Bad
    (h & 0x0f, n)
  }

  private def typeName(t: Int): String = t match {
    case 0 => "boolean"
    case 1 => "int32"
    case 2 => "int64"
    case 3 => "int96"
    case 4 => "float"
    case 5 => "double"
    case 6 => "byte_array"
    case 7 => "fixed_len_byte_array"
    case _ => "unknown"
  }

  private def repName(rp: Int): String = rp match {
    case 0 => "required"
    case 1 => "optional"
    case 2 => "repeated"
    case _ => "unknown"
  }

  /** One SchemaElement: (type, repetition, name, numChildren). */
  private def schemaElement(r: Reader): (Int, Int, String, Int) = {
    var tpe = -1
    var rep = -1
    var name: String = null
    var nChildren = 0
    var lastFid = 0
    var done = false
    while (!done) {
      val h = r.u8()
      if (h == TStop) done = true
      else {
        val t = h & 0x0f
        val delta = (h >> 4) & 0x0f
        lastFid = if (delta == 0) r.zigzag().toInt else lastFid + delta
        lastFid match {
          case 1 if t == TI32 => tpe = r.zigzag().toInt
          case 3 if t == TI32 => rep = r.zigzag().toInt
          case 4 if t == TBinary => name = r.string()
          case 5 if t == TI32 => nChildren = r.zigzag().toInt
          case _ => skipValue(r, t, 0)
        }
      }
    }
    if (name == null) throw Bad
    (tpe, rep, name, nChildren)
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], maxColumns: Int): InternalRow = {
    try {
      val n = bytes.length
      if (n < 12) return null
      if (bytes(0) != 'P' || bytes(1) != 'A' || bytes(2) != 'R' ||
        bytes(3) != '1') return null
      if (bytes(n - 4) != 'P' || bytes(n - 3) != 'A' ||
        bytes(n - 2) != 'R' || bytes(n - 1) != '1') return null
      val flen = (bytes(n - 8) & 0xff) | ((bytes(n - 7) & 0xff) << 8) |
        ((bytes(n - 6) & 0xff) << 16) | ((bytes(n - 5) & 0xff) << 24)
      if (flen <= 0 || n - 8 - flen < 4) return null
      val r = new Reader(bytes, n - 8 - flen, n - 8)
      var version = 0
      var numRows = 0L
      var nRowGroups = 0
      var createdBy: String = null
      val cols = new java.util.ArrayList[Any]
      var lastFid = 0
      var done = false
      while (!done) {
        val h = r.u8()
        if (h == TStop) done = true
        else {
          val t = h & 0x0f
          val delta = (h >> 4) & 0x0f
          lastFid = if (delta == 0) r.zigzag().toInt else lastFid + delta
          lastFid match {
            case 1 if t == TI32 => version = r.zigzag().toInt
            case 2 if t == TList =>
              // the schema tree, depth-first with num_children counts;
              // element 0 is the root group
              val (et, cnt) = listHeader(r)
              if (et != TStruct || cnt < 1 || cnt > maxColumns + 1)
                throw Bad
              // stack of (remaining children, dotted prefix)
              var rem = List.empty[Int]
              var prefix = List.empty[String]
              var i = 0
              while (i < cnt) {
                val (tpe, rep, name, nCh) = schemaElement(r)
                if (i == 0) {
                  // root: its children are the top-level fields
                  if (nCh < 0) throw Bad
                  rem = List(nCh)
                  prefix = List("")
                } else {
                  if (rem.isEmpty || rem.head <= 0) throw Bad
                  val path = prefix.head + name
                  rem = (rem.head - 1) :: rem.tail
                  if (nCh > 0) { // group node: descend
                    rem = nCh :: rem
                    prefix = (path + ".") :: prefix
                  } else {
                    cols.add(new GenericInternalRow(Array[Any](
                      UTF8String.fromString(path),
                      UTF8String.fromString(typeName(tpe)),
                      UTF8String.fromString(repName(rep)))))
                  }
                }
                // pop exhausted groups (incl. an empty root)
                while (rem.nonEmpty && rem.head == 0) {
                  rem = rem.tail
                  prefix = prefix.tail
                }
                i += 1
              }
              // the walk must consume the tree exactly (root popped too)
              if (rem.nonEmpty) throw Bad
            case 3 if t == TI64 => numRows = r.zigzag()
            case 4 if t == TList =>
              val (et, cnt) = listHeader(r)
              if (et != TStruct || cnt < 0) throw Bad
              var i = 0
              while (i < cnt) { skipValue(r, TStruct, 0); i += 1 }
              nRowGroups = cnt
            case 6 if t == TBinary => createdBy = r.string()
            case _ => skipValue(r, t, 0)
          }
        }
      }
      new GenericInternalRow(Array[Any](
        version, numRows, nRowGroups,
        if (createdBy == null) null else UTF8String.fromString(createdBy),
        new GenericArrayData(cols.toArray)))
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; the schema walk bound defaults to
    * 4096 elements. */
  def apply(payload: Column, maxColumns: Int = 4096): Column =
    ColumnShim.column(
      ParquetFooterMeta(ColumnShim.expression(payload), maxColumns))
}
