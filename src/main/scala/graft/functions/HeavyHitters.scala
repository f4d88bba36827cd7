package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator`: finds
  * every token whose count exceeds `n / k` in ONE pass with bounded
  * state (`capacity` counters per partial), no matter how many
  * distinct tokens the corpus holds.
  *
  * Why not `groupBy(token).count()`: the exact group-by shuffles one
  * row per DISTINCT token — at 100 TB a web corpus has billions of
  * distinct tokens, almost all of them singletons, and the shuffle is
  * dominated by exactly the tail a heavy-hitters question throws away.
  * The sketch's map-side partials are `capacity`-bounded, so the
  * shuffle carries `capacity · partitions` counters total.
  *
  * Guarantee (mergeable-summaries form): point-wise merging two MG
  * summaries and trimming back to `capacity` counters (subtracting the
  * (capacity+1)-th largest count) keeps the estimation error ≤
  * n / (capacity + 1). With `capacity ≥ 4k`, any token with true count
  * > n/k has estimate ≥ count − n/(4k+1) > 0 and SURVIVES the sketch —
  * recall is exact; precision is restored downstream by re-joining the
  * candidates against exact counts (the q95 contract: sketch for
  * candidates, exact verification for the emitted set — same
  * cross-check pattern as the percentile sketch, q77).
  */
class HeavyHitters(capacity: Int)
    extends Aggregator[String, scala.collection.mutable.HashMap[String, Long], Seq[String]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  private type Buf = scala.collection.mutable.HashMap[String, Long]

  def zero: Buf = scala.collection.mutable.HashMap.empty

  /** Classic MG step: count if tracked or room; otherwise decrement
    * everyone (dropping zeros) — the "cancel one of each" trick.
    * The Aggregator owns its buffer, so all paths mutate IN PLACE: on
    * a vocab-heavy corpus (mostly singleton tokens) the decrement path
    * is the hot loop, and rebuilding an immutable map per untracked
    * token is O(capacity) allocation per miss. */
  def reduce(buf: Buf, tok: String): Buf = {
    if (tok == null) buf
    else buf.get(tok) match {
      case Some(c) => buf(tok) = c + 1; buf
      case None if buf.size < capacity => buf(tok) = 1L; buf
      case None =>
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.filterInPlace((_, c) => c > 0)
        buf
    }
  }

  /** Mergeable-summaries merge: point-wise sum, then subtract the
    * (capacity+1)-th largest count from everyone and drop ≤ 0.
    * Same trim semantics as the immutable form, in-place on `a`. */
  def merge(a: Buf, b: Buf): Buf = {
    b.foreach { case (t, c) => a(t) = a.getOrElse(t, 0L) + c }
    if (a.size <= capacity) a
    else {
      val cut = a.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      a.filterInPlace((_, c) => c > cut)
      a.mapValuesInPlace((_, c) => c - cut)
      a
    }
  }

  /** Deterministic candidate order (estimate desc, token asc). */
  def finish(buf: Buf): Seq[String] =
    buf.toSeq.sortBy { case (t, c) => (-c, t) }.map(_._1)

  def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

object HeavyHitters {
  /** Column form over a token column. */
  def sketch(capacity: Int, tok: Column): Column =
    udaf(new HeavyHitters(capacity), Encoders.STRING).apply(tok)
}
