package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WebAssembly module census — the fourth executable format a web
  * crawl meets (after [[BinaryMeta]]'s ELF/PE/Mach-O), from the
  * public core spec: `\0asm` magic + u32 version, then sections of
  * `(id u8, size uleb128, payload)`. The census walks every section
  * boundary (sizes VERIFIED against the payload end) and decodes the
  * import/export surface a supply-chain or corpus pipeline wants:
  *
  *  - type section (1): function-signature count;
  *  - import section (2): entries parsed in full (`module.name`
  *    strings, import kind func/table/memory/global with its
  *    typed descriptor — limits flags validated);
  *  - function section (3): locally-defined function count;
  *  - export section (7): `name` + kind + index per entry.
  *
  * Output `(version, n_sections, n_types, n_imports, n_exports,
  * n_functions, import_names, export_names)` where names are
  * `module.field` / `name` strings in declaration order (each list
  * capped at `maxNames`; the COUNTS stay exact past the cap).
  * FAIL-CLOSED NULL for: bad magic/version, a section size running
  * past the payload, truncated LEB128, section ids over 12,
  * malformed import descriptors, name bytes that are not UTF-8.
  * Per-row bounded work, zero shuffle, codegen'd. */
case class WasmMeta(child: Expression, maxNames: Int)
    extends UnaryExpression {
  require(maxNames > 0, "name cap must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wasm_meta expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("n_sections", IntegerType, nullable = false),
    StructField("n_types", IntegerType, nullable = false),
    StructField("n_imports", IntegerType, nullable = false),
    StructField("n_exports", IntegerType, nullable = false),
    StructField("n_functions", IntegerType, nullable = false),
    StructField("import_names", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("export_names", ArrayType(StringType, containsNull = false),
      nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    WasmMeta.compute(a.asInstanceOf[Array[Byte]], maxNames)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.WasmMeta.compute($c, $maxNames);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "wasm_meta"
}

object WasmMeta {

  private object Bad extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  private final class Rd(b: Array[Byte], var p: Int, val end: Int) {
    def u8(): Int = {
      if (p >= end) throw Bad
      val v = b(p) & 0xff
      p += 1
      v
    }
    def uleb(): Long = {
      var v = 0L
      var shift = 0
      while (shift < 35) {
        val x = u8()
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
      }
      throw Bad // over 32 bits: not a valid u32 LEB
    }
    def name(): String = {
      val n = uleb()
      if (n > 65536 || p + n > end) throw Bad
      val s = new String(b, p, n.toInt,
        java.nio.charset.StandardCharsets.UTF_8)
      // reject non-UTF-8 (the decoder substitutes U+FFFD)
      if (s.contains('�')) throw Bad
      p += n.toInt
      s
    }
    /** limits: flag 0 → min; flag 1 → min,max. */
    def limits(): Unit = {
      val flag = u8()
      if (flag != 0 && flag != 1) throw Bad
      uleb()
      if (flag == 1) uleb()
    }
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte], maxNames: Int): GenericInternalRow = {
    try {
      if (b == null || b.length < 8) return null
      if (b(0) != 0x00 || b(1) != 'a' || b(2) != 's' || b(3) != 'm')
        return null
      val version = (b(4) & 0xff) | ((b(5) & 0xff) << 8) |
        ((b(6) & 0xff) << 16) | ((b(7) & 0xff) << 24)
      if (version != 1) return null
      var p = 8
      var nSections = 0
      var nTypes = 0
      var nImports = 0
      var nExports = 0
      var nFunctions = 0
      val importNames = new scala.collection.mutable.ArrayBuffer[UTF8String]
      val exportNames = new scala.collection.mutable.ArrayBuffer[UTF8String]
      while (p < b.length) {
        val top = new Rd(b, p, b.length)
        val id = top.u8()
        if (id > 12) throw Bad
        val size = top.uleb()
        if (size > b.length - top.p) throw Bad
        val secEnd = top.p + size.toInt
        nSections += 1
        id match {
          case 1 => // type section: vec(functype)
            val r = new Rd(b, top.p, secEnd)
            val n = r.uleb()
            if (n > Int.MaxValue) throw Bad
            nTypes = n.toInt
          case 2 => // import section
            val r = new Rd(b, top.p, secEnd)
            val n = r.uleb()
            if (n > 1000000) throw Bad
            nImports = n.toInt
            var i = 0
            while (i < n) {
              val mod = r.name()
              val field = r.name()
              r.u8() match {
                case 0 => r.uleb() // func: typeidx
                case 1 => // table: reftype + limits
                  val rt = r.u8()
                  if (rt != 0x70 && rt != 0x6f) throw Bad
                  r.limits()
                case 2 => r.limits() // memory
                case 3 => // global: valtype + mutability
                  r.u8()
                  val mut = r.u8()
                  if (mut > 1) throw Bad
                case _ => throw Bad
              }
              if (importNames.size < maxNames)
                importNames += UTF8String.fromString(s"$mod.$field")
              i += 1
            }
            if (r.p != secEnd) throw Bad
          case 3 => // function section: vec(typeidx)
            val r = new Rd(b, top.p, secEnd)
            val n = r.uleb()
            if (n > Int.MaxValue) throw Bad
            nFunctions = n.toInt
          case 7 => // export section
            val r = new Rd(b, top.p, secEnd)
            val n = r.uleb()
            if (n > 1000000) throw Bad
            nExports = n.toInt
            var i = 0
            while (i < n) {
              val nm = r.name()
              val kind = r.u8()
              if (kind > 3) throw Bad
              r.uleb() // index
              if (exportNames.size < maxNames)
                exportNames += UTF8String.fromString(nm)
              i += 1
            }
            if (r.p != secEnd) throw Bad
          case _ => () // custom/other sections: boundary-validated skip
        }
        p = secEnd
      }
      new GenericInternalRow(Array[Any](
        version, nSections, nTypes, nImports, nExports, nFunctions,
        new GenericArrayData(importNames.toArray[Any]),
        new GenericArrayData(exportNames.toArray[Any])))
    } catch {
      case Bad => null
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point; default name cap 256 per list. */
  def apply(payload: Column, maxNames: Int = 256): Column =
    ColumnShim.column(WasmMeta(ColumnShim.expression(payload), maxNames))
}
