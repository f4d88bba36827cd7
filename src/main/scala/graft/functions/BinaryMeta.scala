package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Executable/object-file census — the routing step a software corpus
  * needs before any code analysis: one header read labels the three
  * mainstream formats, their architecture, word width and kind, no
  * section data touched.
  *
  *  - ELF: ident (class/endianness), `e_type` (relocatable /
  *    executable / shared / core), `e_machine` (x86-64, aarch64,
  *    riscv64, i386, arm, ppc64, s390x — others surface as
  *    `machine_N`), section count from `e_shnum`;
  *  - PE: `MZ` stub → `e_lfanew` → `PE\0\0` COFF header — machine,
  *    section count, the optional-header magic's 32/64 split, DLL
  *    bit from the characteristics;
  *  - Mach-O: 32/64-bit magics in BOTH byte orders, cputype,
  *    filetype, `ncmds` as the structure count; FAT binaries
  *    (0xCAFEBABE with a plausible arch count) label `macho-fat`
  *    with the slice count.
  *
  * Output `(format, arch, bits, kind, n_sections)`. FAIL-CLOSED
  * NULL: too short for its header, unknown magic, an ELF class or
  * PE offset out of range. Per-row bounded work, zero shuffle,
  * codegen'd. */
case class BinaryMeta(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"binary_meta expects binary input, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("arch", StringType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("n_sections", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    BinaryMeta.compute(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BinaryMeta.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "binary_meta"
}

object BinaryMeta {

  /** The per-row kernel — public static so generated code can call it. */
  def compute(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 4) return null
    try {
      if (b(0) == 0x7f.toByte && b(1) == 'E' && b(2) == 'L' && b(3) == 'F')
        elf(b)
      else if (b(0) == 0x00 && b(1) == 'a' && b(2) == 's' && b(3) == 'm') {
        // WebAssembly: the fourth executable format in web corpora —
        // the full import/export census lives in [[WasmMeta]]
        val w = WasmMeta.compute(b, 1)
        if (w == null) null
        else row("wasm", "wasm", 32, "module", w.getInt(1))
      }
      else if (b(0) == 'M' && b(1) == 'Z') pe(b)
      else {
        val m = be32(b, 0)
        if (m == 0xfeedface || m == 0xfeedfacf ||
          m == 0xcefaedfe || m == 0xcffaedfe) macho(b, m)
        else if (m == 0xcafebabe && b.length >= 8) {
          // FAT Mach-O vs Java class: a class file has a version
          // here (>= 45); a FAT arch count is tiny
          val cnt = be32(b, 4)
          if (cnt >= 1 && cnt <= 18)
            row("macho-fat", "multi", 0, "fat", cnt)
          else null
        } else null
      }
    } catch {
      case _: ArrayIndexOutOfBoundsException => null
    }
  }

  private def elf(b: Array[Byte]): InternalRow = {
    if (b.length < 52) return null
    val cls = b(4) & 0xff
    val dat = b(5) & 0xff
    if ((cls != 1 && cls != 2) || (dat != 1 && dat != 2)) return null
    val bits = if (cls == 2) 64 else 32
    val le = dat == 1
    def u16(p: Int): Int =
      if (le) (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)
      else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
    val kind = u16(16) match {
      case 1 => "relocatable"
      case 2 => "executable"
      case 3 => "shared"
      case 4 => "core"
      case t => s"type_$t"
    }
    val arch = u16(18) match {
      case 3 => "i386"
      case 8 => "mips"
      case 20 => "ppc"
      case 21 => "ppc64"
      case 22 => "s390x"
      case 40 => "arm"
      case 62 => "x86_64"
      case 183 => "aarch64"
      case 243 => "riscv"
      case m => s"machine_$m"
    }
    val shnumOff = if (bits == 64) 60 else 48
    if (b.length < shnumOff + 2) return null
    row("elf", arch, bits, kind, u16(shnumOff))
  }

  private def pe(b: Array[Byte]): InternalRow = {
    if (b.length < 0x40) return null
    val lfanew = le32(b, 0x3c)
    if (lfanew < 0 || lfanew + 24 > b.length) return null
    if (!(b(lfanew) == 'P' && b(lfanew + 1) == 'E' &&
      b(lfanew + 2) == 0 && b(lfanew + 3) == 0)) return null
    val machine = le16(b, lfanew + 4)
    val nSec = le16(b, lfanew + 6)
    val chars = le16(b, lfanew + 22)
    val optSize = le16(b, lfanew + 20)
    val bits =
      if (optSize >= 2 && lfanew + 26 <= b.length) {
        le16(b, lfanew + 24) match {
          case 0x10b => 32
          case 0x20b => 64
          case _ => 0
        }
      } else 0
    val arch = machine match {
      case 0x014c => "i386"
      case 0x8664 => "x86_64"
      case 0xaa64 => "aarch64"
      case 0x01c0 | 0x01c4 => "arm"
      case 0x5064 => "riscv"
      case m => s"machine_$m"
    }
    val kind = if ((chars & 0x2000) != 0) "dll" else "executable"
    row("pe", arch, bits, kind, nSec)
  }

  private def macho(b: Array[Byte], m: Int): InternalRow = {
    if (b.length < 28) return null
    val bits = if (m == 0xfeedfacf || m == 0xcffaedfe) 64 else 32
    // the magic reads big-endian here, so the REVERSED forms mean the
    // file is little-endian
    val le = m == 0xcefaedfe || m == 0xcffaedfe
    def u32(p: Int): Int = if (le) le32(b, p) else be32(b, p)
    val cpu = u32(4)
    val arch = (cpu & 0xffffff) match {
      case 7 => if ((cpu & 0x1000000) != 0) "x86_64" else "i386"
      case 12 => if ((cpu & 0x1000000) != 0) "aarch64" else "arm"
      case 18 => "ppc"
      case c => s"cpu_$c"
    }
    val kind = u32(12) match {
      case 1 => "object"
      case 2 => "executable"
      case 6 => "shared"
      case 8 => "bundle"
      case 10 => "dsym"
      case t => s"type_$t"
    }
    row("macho", arch, bits, kind, u32(16))
  }

  private def row(f: String, a: String, bits: Int, k: String,
                  n: Int): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(f),
      UTF8String.fromString(a), bits, UTF8String.fromString(k), n))

  private def le16(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)

  private def be32(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(payload: Column): Column =
    ColumnShim.column(BinaryMeta(ColumnShim.expression(payload)))
}
