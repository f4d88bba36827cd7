package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.TextAnalysis

class JsonPathTypesSpec extends SparkSpec {
  import spark.implicits._

  private def paths(json: String, depth: Int): Seq[(String, String)] =
    Seq(Tuple1(json)).toDF("json")
      .select(explode(JsonPathTypes(col("json"), depth)).as("e"))
      .select("e.path", "e.jtype").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  test("json_path_types: dotted paths, leaf-typed arrays, depth bound keeps the object label") {
    val j = """{"a":1,"meta":{"lang":"en","tags":[{"k":1},2],""" +
      """"deep":{"x":true}},"b":null,"s":"t","f":false}"""
    val got = paths(j, 2).toSet
    assert(got == Set(
      "a" -> "number", "meta" -> "object", "meta.lang" -> "string",
      "meta.tags" -> "array", "meta.deep" -> "object",
      "b" -> "null", "s" -> "string", "f" -> "bool"))
    // depth 1: top-level only; nested objects still labeled object
    assert(paths(j, 1).toSet == Set("a" -> "number", "meta" -> "object",
      "b" -> "null", "s" -> "string", "f" -> "bool"))
    // array interiors are never enumerated — no meta.tags.k at any depth
    assert(!paths(j, 5).exists(_._1.contains("tags.")))
    // duplicate keys: one row each
    assert(paths("""{"k":1,"k":"x"}""", 2)
      == Seq("k" -> "number", "k" -> "string"))
  }

  test("json_path_types fails closed on malformed; valid non-objects yield no rows") {
    val df = Seq(
      (1L, "{oops"), (2L, """{"a":}"""), (3L, """{"a":1} extra"""),
      (4L, """{"a":"unterminated}"""), (5L, """{"a":01e}"""),
      (6L, """{"a":"bad\escape"}"""), (7L, ""), (8L, "[1,2]"), (9L, "42"),
      (10L, """{"ok":1}"""), (11L, """{"a":01}""")).toDF("id", "json")
    val out = df.select(col("id"),
      JsonPathTypes(col("json"), 3).as("p")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Any](1)))
      .toMap
    for (bad <- Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 11L))
      assert(out(bad) == null, s"row $bad must fail closed")
    assert(out(8L) != null && out(8L).isEmpty, "valid array: empty")
    assert(out(9L) != null && out(9L).isEmpty, "valid scalar: empty")
    assert(out(10L).length == 1)
  }

  test("json_path_types: adversarial nesting fails closed at the hard depth " +
    "cap instead of blowing the task stack") {
    // ~100KB of '[' — descent past HardDepthCap must yield null, not
    // StackOverflowError (maxDepth only bounds RECORDING, not descent)
    val deepArr = "[" * 100000
    val deepObj = "{\"a\":" * 100000
    assert(JsonPathTypes.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(deepArr), 3) == null)
    assert(JsonPathTypes.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(deepObj), 3) == null)
    // a VALID object just under the cap still parses
    val d = 500
    val ok = "{\"a\":" * d + "1" + "}" * d
    assert(JsonPathTypes.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(ok), 3) != null)
    // and one past the cap fails closed even when syntactically valid
    val d2 = JsonPathTypes.HardDepthCap + 1
    val over = "{\"a\":" * d2 + "1" + "}" * d2
    assert(JsonPathTypes.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(over), 3) == null)
  }

  test("jsonInferSchema: census collapses to one DDL string — majority " +
    "types, bottom-up struct fold, depth-bounded objects as maps, " +
    "NOT NULL only for never-null universal fields; fromDDL round-trips") {
    val df = Seq(
      """{"a":1,"b":"x","flag":true,"tags":[1],"meta":{"lang":"en","deep":{"z":1}}}""",
      """{"a":2,"b":null,"flag":false,"tags":[],"meta":{"lang":"fr","deep":{"z":2}}}""",
      "{broken").toDF("json")
    val census = TextAnalysis.jsonPathCensus(df, maxDepth = 2)
    val schema = TextAnalysis.jsonInferSchema(census, maxDepth = 2)
      .collect()(0).getString(0)
    assert(schema ==
      "a double NOT NULL, b string, flag boolean NOT NULL, " +
        "meta struct<deep:map<string,string>,lang:string> NOT NULL, " +
        "tags array<string> NOT NULL")
    // the artifact is an explicit-reader schema: it must parse
    val st = org.apache.spark.sql.types.StructType.fromDDL(schema)
    assert(st.fieldNames.toSeq == Seq("a", "b", "flag", "meta", "tags"))
    assert(!st("a").nullable && st("b").nullable)
    assert(st("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
    // majority rule: a path that is string in 2 docs, number in 1
    val mixed = Seq("""{"v":"s"}""", """{"v":"t"}""", """{"v":3}""")
      .toDF("json")
    val ms = TextAnalysis.jsonInferSchema(
      TextAnalysis.jsonPathCensus(mixed, maxDepth = 2), 2)
      .collect()(0).getString(0)
    assert(ms == "v string NOT NULL")
  }

  test("jsonPathCensus: per-path type counts aggregate over the corpus") {
    val df = Seq(
      """{"a":1,"m":{"x":"s"}}""",
      """{"a":"t","m":{"x":null}}""",
      "{broken").toDF("json")
    val out = TextAnalysis.jsonPathCensus(df, maxDepth = 2)
      .orderBy("path").collect()
      .map(r => r.getString(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Long]))
      .toMap
    // columns: n_total, n_object, n_array, n_string, n_number, n_bool, n_null
    assert(out("a") == Seq(2L, 0L, 0L, 1L, 1L, 0L, 0L))
    assert(out("m") == Seq(2L, 2L, 0L, 0L, 0L, 0L, 0L))
    assert(out("m.x") == Seq(2L, 0L, 0L, 1L, 0L, 0L, 1L))
    assert(out.size == 3)
  }
}
