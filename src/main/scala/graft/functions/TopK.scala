package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One ranked element in the top-k buffer/output: an ordering value and
  * the row id it belongs to. */
final case class Scored(ord: Double, id: Long)

/** The aggregator's input row — nullable on both sides so a stray null
  * score or id is SKIPPED (a null has no rank) instead of killing a
  * 100 TB job mid-shuffle. */
final case class ScoredIn(ord: Option[Double], id: Option[Long])

/** Typed aggregator: per-group top-k with a bounded buffer.
  *
  * The usual per-key top-k (`row_number().over(Window.partitionBy(key)
  * .orderBy(ord.desc)) <= k`) shuffles EVERY row to its key's partition
  * and sorts the whole partition — at 100 TB the full fact table moves.
  * As an `Aggregator` (SURVEY.md §2.10 extension surface) the same
  * result comes from partial aggregation: each map task keeps at most k
  * rows per key, so the shuffle carries ≤ k·keys·partitions rows and
  * the sort is gone. Buffers are sorted best-first and merge in O(k),
  * so combine stays associative and commutative.
  *
  * Ordering: higher `ord` first, ties broken by smaller `id` — the
  * deterministic tiebreak every oracle-checked ranking in this repo
  * uses (same as `ORDER BY ord DESC, id ASC`).
  */
class TopK(k: Int) extends Aggregator[ScoredIn, List[Scored], Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  // Spark SQL's double ordering (SQLOrderingUtil.compareDoubles) checks
  // primitive == first — so -0.0 and 0.0 are EQUAL and fall through to the
  // id tiebreak — then Double.compare, which gives NaN a total-order
  // position (largest double, NaN == NaN). Primitive == is false for NaN,
  // so NaN still orders via Double.compare; plain Double.compare alone
  // would rank 0.0 strictly above -0.0 and diverge from the documented
  // `ORDER BY ord DESC, id ASC` oracle semantics.
  private def beats(a: Scored, b: Scored): Boolean = {
    val c = if (a.ord == b.ord) 0 else java.lang.Double.compare(a.ord, b.ord)
    c > 0 || (c == 0 && a.id < b.id)
  }

  def zero: List[Scored] = Nil

  def reduce(buf: List[Scored], in: ScoredIn): List[Scored] = (in.ord, in.id) match {
    case (Some(ord), Some(id)) =>
      val v = Scored(ord, id)
      // buf is sorted best-first with ≤ k elements; common case at
      // steady state is "worse than the current k-th" — reject in O(k)
      val (pre, post) = buf.span(beats(_, v))
      if (pre.length >= k) buf else (pre ::: v :: post).take(k)
    case _ => buf // null score or id: unrankable, skip
  }

  def merge(a: List[Scored], b: List[Scored]): List[Scored] = {
    @annotation.tailrec
    def go(x: List[Scored], y: List[Scored], acc: List[Scored], n: Int): List[Scored] =
      if (n == k) acc.reverse
      else (x, y) match {
        case (Nil, Nil)          => acc.reverse
        case (Nil, h :: t)       => go(Nil, t, h :: acc, n + 1)
        case (h :: t, Nil)       => go(t, Nil, h :: acc, n + 1)
        case (hx :: tx, hy :: ty) =>
          if (beats(hx, hy)) go(tx, y, hx :: acc, n + 1)
          else go(x, ty, hy :: acc, n + 1)
      }
    go(a, b, Nil, 0)
  }

  def finish(buf: List[Scored]): Seq[Scored] = buf

  def bufferEncoder: Encoder[List[Scored]] = ExpressionEncoder[List[Scored]]()
  def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopK {
  /** Column form for `groupBy(...).agg(...)`: returns
    * `array<struct<ord,id>>` sorted best-first, length ≤ k.
    * `posexplode` it to get ranked rows (rank = pos + 1). */
  def topK(k: Int, ord: Column, id: Column): Column =
    udaf(new TopK(k), Encoders.product[ScoredIn]).apply(ord, id)
}
