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

/** Arrow IPC FILE (feather v2) footer census — the in-memory-format
  * lake tier next to the parquet/ORC/avro kernels (the Arrow file
  * format and flatbuffers wire layout are public specs): the file is
  * `ARROW1\0\0 … footer-flatbuffer footerLen ARROW1`; the footer's
  * `Footer` table carries the format version, the dictionary and
  * record-batch BLOCK lists (offset/metadata/body sizes — the
  * split-planner census), and the `Schema` table whose `Field` names
  * are the column list. This kernel hand-walks the flatbuffer:
  * root/table/vtable indirection, inline scalars, struct vectors
  * (24-byte Blocks), offset vectors (Field tables), strings.
  *
  * Output struct: `(version, n_dictionaries, n_record_batches,
  * total_body_bytes, columns)`.
  *
  * FAIL-CLOSED NULL on: missing magics, a footer length past the
  * buffer, any flatbuffer offset escaping the footer slice, counts
  * past `maxColumns`/`maxBatches`. Per-row bounded work — the footer
  * only, no batch data touched — zero shuffle, codegen'd. */
case class ArrowFooterMeta(child: Expression, maxColumns: Int, maxBatches: Int)
    extends UnaryExpression {
  require(maxColumns > 0 && maxBatches > 0, "bounds must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"arrow_meta expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("n_dictionaries", IntegerType, nullable = false),
    StructField("n_record_batches", IntegerType, nullable = false),
    StructField("total_body_bytes", LongType, nullable = false),
    StructField("columns", ArrayType(StringType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    ArrowFooterMeta.compute(a.asInstanceOf[Array[Byte]], maxColumns, maxBatches)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ArrowFooterMeta.compute($c, $maxColumns, $maxBatches);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "arrow_meta"
}

object ArrowFooterMeta {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  /** The per-row kernel — public static so generated code can call it. */
  def compute(bytes: Array[Byte], maxColumns: Int,
              maxBatches: Int): InternalRow = {
    try {
      val n = bytes.length
      if (n < 8 + 10) return null
      // magics: "ARROW1\0\0" head, "ARROW1" tail
      val head = Array[Byte]('A', 'R', 'R', 'O', 'W', '1', 0, 0)
      var i = 0
      while (i < 8) {
        if (bytes(i) != head(i)) return null
        i += 1
      }
      val tail = "ARROW1"
      i = 0
      while (i < 6) {
        if (bytes(n - 6 + i) != tail.charAt(i).toByte) return null
        i += 1
      }
      def le16(p: Int): Int = {
        if (p < 0 || p + 2 > n) throw Bad
        (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      }
      def le32(p: Int): Int = {
        if (p < 0 || p + 4 > n) throw Bad
        (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
          ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
      }
      def le64(p: Int): Long = {
        if (p < 0 || p + 8 > n) throw Bad
        var v = 0L
        var k = 7
        while (k >= 0) { v = (v << 8) | (bytes(p + k) & 0xffL); k -= 1 }
        v
      }
      val footerLen = le32(n - 10)
      val fStart = n - 10 - footerLen
      if (footerLen <= 0 || fStart < 8) return null
      val fEnd = n - 10
      def inFooter(p: Int): Int = {
        if (p < fStart || p >= fEnd) throw Bad
        p
      }
      // flatbuffer table access: field slot via the vtable
      def fieldPos(table: Int, id: Int): Int = {
        val vt = table - le32(inFooter(table)) // SIGNED soffset
        if (vt < fStart || vt >= fEnd) throw Bad
        val vtSize = le16(vt)
        val slot = 4 + 2 * id
        if (slot + 2 > vtSize) return 0
        val off = le16(vt + slot)
        if (off == 0) 0 else table + off
      }
      val root = fStart + le32(fStart)
      inFooter(root)
      // version: inline int16, default 0
      val vPos = fieldPos(root, 0)
      val version = if (vPos == 0) 0 else le16(inFooter(vPos))
      // block vectors: dictionaries id 2, recordBatches id 3
      def blocks(id: Int): (Int, Long) = {
        val fp = fieldPos(root, id)
        if (fp == 0) return (0, 0L)
        val vec = fp + le32(inFooter(fp))
        val count = le32(inFooter(vec))
        if (count < 0 || count > maxBatches) throw Bad
        var body = 0L
        var k = 0
        while (k < count) {
          val bp = vec + 4 + 24 * k // Block: offset, metaLen(+pad), bodyLen
          inFooter(bp)
          inFooter(bp + 23)
          body += le64(bp + 16)
          k += 1
        }
        (count, body)
      }
      val (nDict, dictBody) = blocks(2)
      val (nBatch, batchBody) = blocks(3)
      // schema → fields vector → each Field's name string
      val cols = new java.util.ArrayList[Any]
      val sp = fieldPos(root, 1)
      if (sp != 0) {
        val schema = sp + le32(inFooter(sp))
        val fieldsP = fieldPos(inFooter(schema), 1)
        if (fieldsP != 0) {
          val vec = fieldsP + le32(inFooter(fieldsP))
          val count = le32(inFooter(vec))
          if (count < 0 || count > maxColumns) throw Bad
          var k = 0
          while (k < count) {
            val ep = vec + 4 + 4 * k
            val ft = ep + le32(inFooter(ep))
            val np = fieldPos(inFooter(ft), 0)
            if (np == 0) cols.add(UTF8String.fromString(""))
            else {
              val str = np + le32(inFooter(np))
              val len = le32(inFooter(str))
              if (len < 0 || str + 4 + len > fEnd) throw Bad
              cols.add(UTF8String.fromBytes(
                java.util.Arrays.copyOfRange(bytes, str + 4, str + 4 + len)))
            }
            k += 1
          }
        }
      }
      new GenericInternalRow(Array[Any](version, nDict, nBatch,
        dictBody + batchBody, new GenericArrayData(cols.toArray)))
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; 4096 columns, 1M batches. */
  def apply(payload: Column, maxColumns: Int = 4096,
            maxBatches: Int = 1 << 20): Column =
    ColumnShim.column(
      ArrowFooterMeta(ColumnShim.expression(payload), maxColumns, maxBatches))
}
