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

/** Dotted-path + type stream of a JSON object — the schema-discovery
  * kernel behind the nested census real JSONL lakes need before an
  * explicit-schema read can be written confidently: one recursive-
  * descent pass emits `(path, jtype)` for every object key down to
  * `maxDepth` levels (`meta.lang` at depth 2), with `jtype` ∈
  * `object | array | string | number | bool | null`. Objects deeper
  * than `maxDepth` are still recorded AS `object` at their own path —
  * only their children stop being enumerated — so the census is
  * depth-bounded without hiding that more structure exists. Arrays
  * are leaf-typed (`array`), never descended: element paths aren't
  * key paths, and an explicit-schema reader types the element
  * separately.
  *
  * STRICT, FAIL-CLOSED parse: any syntax error — unterminated
  * string, missing colon/comma, bad literal, trailing garbage after
  * the top-level value — yields NULL (the whole row contributes
  * nothing, the DROPMALFORMED convention). A syntactically valid
  * non-object top level (array/scalar) yields an EMPTY array: valid
  * JSON, no key paths. Duplicate keys emit one row each (raw JSON
  * permits them; the census should see the duplication). String
  * escapes are validated but key text is kept raw (un-decoded) —
  * census keys are identifiers, not prose. Per-row bounded work,
  * zero shuffle, codegen'd. */
case class JsonPathTypes(child: Expression, maxDepth: Int)
    extends UnaryExpression {
  require(maxDepth >= 1, "maxDepth must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"json_path_types expects string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("jtype", StringType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    JsonPathTypes.compute(a.asInstanceOf[UTF8String], maxDepth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.JsonPathTypes.compute($c, $maxDepth);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "json_path_types"
}

object JsonPathTypes {

  private object Bad extends Exception with scala.util.control.NoStackTrace

  /** Hard bound on parse-tree depth (objects + arrays combined). JSON
    * this deep is adversarial, not data; rows past it are malformed. */
  val HardDepthCap = 1000

  /** The per-row kernel — public static so generated code can call it.
    * Null = malformed; empty = valid but no key paths. */
  def compute(s: UTF8String, maxDepth: Int): GenericArrayData = {
    val str = s.toString
    val n = str.length
    val out = new java.util.ArrayList[Any]
    var i = 0
    def ws(): Unit =
      while (i < n && (str.charAt(i) == ' ' || str.charAt(i) == '\t' ||
        str.charAt(i) == '\n' || str.charAt(i) == '\r')) i += 1
    def expect(c: Char): Unit = {
      if (i >= n || str.charAt(i) != c) throw Bad
      i += 1
    }
    def lit(word: String): Unit = {
      if (!str.startsWith(word, i)) throw Bad
      i += word.length
    }
    // returns the raw (un-decoded) string content; validates escapes
    def parseString(): String = {
      expect('"')
      val start = i
      while (true) {
        if (i >= n) throw Bad
        val c = str.charAt(i)
        if (c == '"') {
          val v = str.substring(start, i)
          i += 1
          return v
        }
        if (c == '\\') {
          if (i + 1 >= n) throw Bad
          val e = str.charAt(i + 1)
          if (e == 'u') {
            if (i + 5 >= n) throw Bad
            var h = i + 2
            while (h < i + 6) {
              val hc = str.charAt(h)
              if (!((hc >= '0' && hc <= '9') || (hc >= 'a' && hc <= 'f') ||
                (hc >= 'A' && hc <= 'F'))) throw Bad
              h += 1
            }
            i += 6
          } else if ("\"\\/bfnrt".indexOf(e) >= 0) i += 2
          else throw Bad
        } else i += 1
      }
      throw Bad // unreachable
    }
    def parseNumber(): Unit = {
      val start = i
      if (i < n && str.charAt(i) == '-') i += 1
      val intStart = i
      var digits = 0
      while (i < n && str.charAt(i) >= '0' && str.charAt(i) <= '9') {
        i += 1; digits += 1
      }
      if (digits == 0) throw Bad
      // JSON forbids leading zeros ("01"): strict means strict
      if (digits > 1 && str.charAt(intStart) == '0') throw Bad
      if (i < n && str.charAt(i) == '.') {
        i += 1
        var f = 0
        while (i < n && str.charAt(i) >= '0' && str.charAt(i) <= '9') {
          i += 1; f += 1
        }
        if (f == 0) throw Bad
      }
      if (i < n && (str.charAt(i) == 'e' || str.charAt(i) == 'E')) {
        i += 1
        if (i < n && (str.charAt(i) == '+' || str.charAt(i) == '-')) i += 1
        var e = 0
        while (i < n && str.charAt(i) >= '0' && str.charAt(i) <= '9') {
          i += 1; e += 1
        }
        if (e == 0) throw Bad
      }
      if (start == i) throw Bad
    }
    // parses any value; `record` is off inside arrays; `depth` is the
    // key depth of this value's own children. Descent is hard-capped at
    // HardDepthCap regardless of maxDepth (maxDepth only stops
    // *recording*): an adversarial row of repeated '[' / '{"a":' must
    // fail closed as malformed, never blow the task stack.
    def parseValue(prefix: String, depth: Int, record: Boolean): String = {
      if (depth > HardDepthCap) throw Bad
      ws()
      if (i >= n) throw Bad
      str.charAt(i) match {
        case '{' =>
          i += 1; ws()
          if (i < n && str.charAt(i) == '}') { i += 1; return "object" }
          var more = true
          while (more) {
            ws()
            val key = parseString()
            ws(); expect(':')
            val path = prefix + key
            val label = parseValue(path + ".", depth + 1, record)
            if (record && depth <= maxDepth)
              out.add(new GenericInternalRow(Array[Any](
                UTF8String.fromString(path), UTF8String.fromString(label))))
            ws()
            if (i < n && str.charAt(i) == ',') i += 1
            else { expect('}'); more = false }
          }
          "object"
        case '[' =>
          i += 1; ws()
          if (i < n && str.charAt(i) == ']') { i += 1; return "array" }
          var more = true
          while (more) {
            parseValue("", depth + 1, record = false)
            ws()
            if (i < n && str.charAt(i) == ',') i += 1
            else { expect(']'); more = false }
          }
          "array"
        case '"' => parseString(); "string"
        case 't' => lit("true"); "bool"
        case 'f' => lit("false"); "bool"
        case 'n' => lit("null"); "null"
        case _ => parseNumber(); "number"
      }
    }
    try {
      ws()
      if (i >= n) return null // empty/blank input is not JSON
      val top = parseValue("", 1, record = true)
      ws()
      if (i != n) return null // trailing garbage
      if (top != "object") out.clear() // valid non-object: no key paths
      new GenericArrayData(out.toArray)
    } catch {
      case Bad => null
      case _: StringIndexOutOfBoundsException => null
    }
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(json: Column, maxDepth: Int): Column =
    ColumnShim.column(JsonPathTypes(ColumnShim.expression(json), maxDepth))
}
