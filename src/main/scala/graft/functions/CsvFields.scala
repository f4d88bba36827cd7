package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RFC 4180 quote-aware CSV field split — the stateful scan a regex
  * split cannot express: a field starting with `"` runs to the
  * closing quote (delimiters inside are literal, `""` unescapes to
  * one `"`), everything else splits on the delimiter byte. The
  * rules, all pinned by unit:
  *   - quotes are special only at FIELD START (RFC 4180: embedded
  *     non-leading quotes are literal text);
  *   - an unterminated quote fails open — the rest of the line is
  *     one field (a truncated record never crashes a 100 TB scan);
  *   - after a closed quote, text before the next delimiter is
  *     appended literally (Excel's lenient reading);
  *   - empty fields (adjacent delimiters, trailing delimiter) are
  *     kept, so the field COUNT is stable for dialect sniffing.
  * One pass over the UTF-8 bytes (the delimiter is a single ASCII
  * byte by contract — comma/semicolon/tab/pipe), inside whole-stage
  * codegen via the static kernel. SQL: `csv_fields(line, ',')`.
  */
case class CsvFields(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"csv_fields expects (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(line: Any, delim: Any): Any =
    CsvFields.compute(line.asInstanceOf[UTF8String],
      delim.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, d) =>
      s"${ev.value} = graft.functions.CsvFields.compute($l, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "csv_fields"
}

object CsvFields {

  /** The per-row kernel — public static so generated code can call
    * it. Requires a 1-byte ASCII delimiter; anything else falls back
    * to comma (documented contract, cheap guard over a throw in a
    * scan kernel). */
  def compute(line: UTF8String, delim: UTF8String): GenericArrayData = {
    val db = delim.getBytes
    val d: Byte = if (db.length == 1) db(0) else ','.toByte
    val bytes = line.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Any]
    val field = new java.io.ByteArrayOutputStream(32)
    var i = 0
    var atFieldStart = true
    while (i <= n) {
      if (i == n) {
        out.add(UTF8String.fromBytes(field.toByteArray))
        field.reset()
        i += 1
      } else if (atFieldStart && bytes(i) == '"'.toByte) {
        // quoted run: to the closing quote, "" unescapes; fail open
        // on an unterminated quote (rest of line is the field)
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (bytes(i) == '"'.toByte) {
            if (i + 1 < n && bytes(i + 1) == '"'.toByte) {
              field.write('"'.toInt); i += 2
            } else { closed = true; i += 1 }
          } else { field.write(bytes(i).toInt); i += 1 }
        }
        atFieldStart = false
      } else if (bytes(i) == d) {
        out.add(UTF8String.fromBytes(field.toByteArray))
        field.reset()
        atFieldStart = true
        i += 1
      } else {
        field.write(bytes(i).toInt)
        atFieldStart = false
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(line: Column, delim: Column): Column =
    ColumnShim.column(CsvFields(ColumnShim.expression(line),
      ColumnShim.expression(delim)))
}
