package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the TopK aggregator's algebra — partial
  * aggregation is only correct if reduce/merge reach the same result
  * for EVERY partitioning of the input. Pure Scala, no SparkSession.
  */
object TopKProperties extends Properties("graft.functions.TopK") {

  private val rowGen: Gen[ScoredIn] = Gen.frequency(
    9 -> (for {
      ord <- Gen.choose(-100.0, 100.0)
      // small id space to force ord ties AND duplicate ids
      id <- Gen.choose(0L, 30L)
    } yield ScoredIn(Some(ord), Some(id))),
    // stray nulls must be skipped, not crash or rank
    1 -> Gen.oneOf(ScoredIn(None, Some(1L)), ScoredIn(Some(1.0), None)))

  private val rowsGen: Gen[List[ScoredIn]] = Gen.listOf(rowGen)

  private def expected(xs: List[ScoredIn], k: Int): List[Scored] =
    xs.collect { case ScoredIn(Some(o), Some(i)) => Scored(o, i) }
      .sortBy(s => (-s.ord, s.id)).take(k)

  property("sequential reduce equals sort-and-take (nulls skipped)") =
    forAll(rowsGen, Gen.choose(1, 8)) { (xs, k) =>
      val agg = new TopK(k)
      xs.foldLeft(agg.zero)(agg.reduce) == expected(xs, k)
    }

  property("any split merged equals the unsplit result") =
    forAll(rowsGen, Gen.choose(1, 8), Gen.choose(0, 100)) { (xs, k, cut) =>
      val agg = new TopK(k)
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else cut % (xs.length + 1))
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      merged == expected(xs, k)
    }

  property("merge is commutative") =
    forAll(rowsGen, rowsGen, Gen.choose(1, 8)) { (a, b, k) =>
      val agg = new TopK(k)
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      agg.merge(ba, bb) == agg.merge(bb, ba)
    }
}
