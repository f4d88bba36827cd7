package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece greedy segmentation (Wu et al. 2016, arXiv:1609.08144;
  * the BERT tokenizer's inference rule): longest-match-first against a
  * MODEL-sized vocabulary — at the word start only plain pieces match,
  * after it only `##`-prefixed continuation pieces, and a word with no
  * match at any position becomes the single `unk` piece (the
  * whole-word UNK convention of the reference implementation). The
  * vocabulary rides along as a broadcast-by-literal reference object
  * (a few thousand strings — the [[Bloom]] pattern), indexed once per
  * JVM into per-length hash sets, so the hot path is a handful of
  * hash probes per codepoint with zero shuffle and zero joins: the
  * 100 TB corpus is segmented in a single narrow codegen'd pass.
  *
  * All positions and lengths are CODEPOINT-based (surrogate pairs are
  * one unit), matching the per-codepoint convention of the BPE/unigram
  * family and the oracle's `substr`/`len`. Null word ⇒ null. */
case class WordpieceSegment(child: Expression, vocab: Seq[String],
                            unk: String = "[UNK]")
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_segment expects string input, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val index =
    new WordpieceSegment.Index(vocab.toArray, unk)

  override def nullSafeEval(a: Any): Any =
    WordpieceSegment.compute(a.asInstanceOf[UTF8String], index)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("wpIndex", index,
      classOf[WordpieceSegment.Index].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordpieceSegment.compute($c, $idx);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "wordpiece_segment"
}

object WordpieceSegment {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Column-level entry point. */
  def apply(word: Column, vocab: Seq[String], unk: String): Column =
    ColumnShim.column(
      WordpieceSegment(ColumnShim.expression(word), vocab, unk))

  /** Vocabulary index: start pieces and continuation BODIES (the
    * piece minus its `##`) in separate sets, plus the max body length
    * in codepoints, so the greedy scan probes longest-first. */
  final class Index(vocab: Array[String], val unk: String)
      extends Serializable {
    val starts = new java.util.HashSet[String]()
    val contBodies = new java.util.HashSet[String]()
    var maxStart = 0
    var maxCont = 0
    vocab.foreach { p =>
      if (p.startsWith("##") && p.length > 2) {
        val body = p.substring(2)
        contBodies.add(body)
        maxCont = math.max(maxCont, body.codePointCount(0, body.length))
      } else {
        starts.add(p)
        maxStart = math.max(maxStart, p.codePointCount(0, p.length))
      }
    }
  }

  /** Greedy longest-match over the codepoint array; returns the piece
    * array (continuations carrying their `##`), or `[unk]` when some
    * position has no match. */
  def compute(word: UTF8String, idx: Index): GenericArrayData = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < n) {
      val atStart = pos == 0
      val maxLen = math.min(if (atStart) idx.maxStart else idx.maxCont, n - pos)
      var l = maxLen
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand = new String(cps, pos, l)
        val found =
          if (atStart) idx.starts.contains(cand)
          else idx.contBodies.contains(cand)
        if (found) hit = cand else l -= 1
      }
      if (hit == null)
        return new GenericArrayData(Array[Any](UTF8String.fromString(idx.unk)))
      out += UTF8String.fromString(if (atStart) hit else "##" + hit)
      pos += l
    }
    new GenericArrayData(out.toArray)
  }
}
