package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native all-language scorer over a per-document char-n-gram census
  * map: for every language in the (reference-object) profile index it
  * returns the present-n-gram partial score `sp = Σ_ng k·w(lang, ng)`
  * and matched count `kp = Σ_ng k` — one struct per language, zeros
  * when nothing matched.
  *
  * This replaces the scoring join of the language-ID family at its
  * hot path: the composable form explodes the census into a
  * corpus-sized (doc, ng, k) stream, hash-joins it against the
  * broadcast profile (multiplying rows by the languages sharing each
  * n-gram) and re-aggregates by (doc, lang) — row-at-a-time string
  * hashing that measured ~30 s of task time per 500-document pass.
  * Here the whole per-document loop runs inside one codegen'd call:
  * one hash probe per census entry, a model-sized dense weight array
  * per hit. The weights are exact nano-nat longs computed upstream
  * (once per profile row); sums of longs are associative, so the
  * output is bit-identical to the join form under any partitioning —
  * ExtSpec pins the two forms equal, and the shuffle-join form
  * remains the fallback when the profile outgrows what an executor
  * should hold (the linearScore dual-form precedent).
  */
case class LangProfileScores(child: Expression,
                             index: LangProfileScores.Index)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case MapType(_: StringType, _: LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects map<string,bigint> input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lang_cand", StringType, nullable = false),
    StructField("sp", LongType, nullable = false),
    StructField("kp", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(a: Any): Any =
    LangProfileScores.compute(a.asInstanceOf[MapData], index)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("langProfIndex", index,
      classOf[LangProfileScores.Index].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LangProfileScores.compute($c, $idx);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "lang_profile_scores"
}

object LangProfileScores {

  private val Absent = Long.MinValue

  /** Profile index: per n-gram, a dense per-language weight array
    * ([[Absent]] where the language's profile lacks the n-gram).
    * Languages are sorted for deterministic construction; emission
    * order is immaterial downstream (the argmax sorts). */
  final class Index(val langs: Array[String]) extends Serializable {
    val byNg = new java.util.HashMap[String, Array[Long]]()
    private val pos = langs.zipWithIndex.toMap
    def add(ng: String, lang: String, w: Long): Unit = {
      var ws = byNg.get(ng)
      if (ws == null) {
        ws = Array.fill(langs.length)(Absent)
        byNg.put(ng, ws)
      }
      ws(pos(lang)) = w
    }
    // langs as UTF8String, pre-encoded once
    val langU: Array[UTF8String] = langs.map(UTF8String.fromString)
  }

  /** The per-row kernel — public static so generated code can call it. */
  def compute(cn: MapData, idx: Index): GenericArrayData = {
    val n = idx.langs.length
    val sp = new Array[Long](n)
    val kp = new Array[Long](n)
    val keys = cn.keyArray()
    val vals = cn.valueArray()
    val m = cn.numElements()
    var i = 0
    while (i < m) {
      val ng = keys.getUTF8String(i)
      val k = vals.getLong(i)
      val ws = idx.byNg.get(ng.toString)
      if (ws != null) {
        var l = 0
        while (l < n) {
          val w = ws(l)
          if (w != Absent) { sp(l) += k * w; kp(l) += k }
          l += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](n)
    var l = 0
    while (l < n) {
      out(l) = new GenericInternalRow(
        Array[Any](idx.langU(l), sp(l), kp(l)))
      l += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(census: Column, index: Index): Column =
    ColumnShim.column(
      LangProfileScores(ColumnShim.expression(census), index))
}
