package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("evalScores: SQuAD normalization (case/punct/articles), multiset " +
    "F1, best-of-refs, both-empty convention") {
    val d = Seq(
      (1L, "The Answer, is 42!", Seq("answer 42", "nope")),
      (2L, "Paris.", Seq("the paris")),
      (3L, "x x y", Seq("x x", "x z z")),   // multiset: ov=2 not 1
      (4L, "", Seq("")),                    // both empty -> 1/1
      (5L, "a the an", Seq("something")),   // all articles -> empty pred
      (6L, "kick the ball", Seq("kick ball")) // mid-answer article: EM
    ).toDF("pred_id", "pred", "refs")
    val out = Eval.evalScores(d).collect().map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getAs[Boolean]("em") &&
      out(1L).getAs[Double]("best_f1") == 0.8 &&
      out(1L).getAs[Long]("n_pred_tokens") == 3L)
    assert(out(2L).getAs[Boolean]("em") &&
      out(2L).getAs[Double]("best_f1") == 1.0)
    assert(out(3L).getAs[Double]("best_f1") == 0.8)
    assert(out(4L).getAs[Boolean]("em") &&
      out(4L).getAs[Double]("best_f1") == 1.0)
    assert(out(5L).getAs[Long]("n_pred_tokens") == 0L &&
      out(5L).getAs[Double]("best_f1") == 0.0)
    // the article's substituted space must COLLAPSE before comparison
    // (official scorer's white_space_fix), so this is an exact match
    assert(out(6L).getAs[Boolean]("em") &&
      out(6L).getAs[Double]("best_f1") == 1.0)
  }

  test("chunkText: overlap windows, short-doc single chunk, empty doc " +
    "zero chunks, last chunk short") {
    val d = Seq((1L, "a" * 95), (2L, "bb"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkText(d, size = 50, overlap = 10).collect()
    val byDoc = out.groupBy(_.getLong(0))
    // 95 chars, stride 40: chunks at 1 (50), 41 (50), 81 (15)
    val c1 = byDoc(1L).sortBy(_.getLong(1))
    assert(c1.length == 3)
    assert(c1.map(_.getLong(2)).toSeq == Seq(1L, 41L, 81L))
    assert(c1.map(_.getLong(3)).toSeq == Seq(50L, 50L, 15L))
    assert(byDoc(2L).length == 1 && byDoc(2L)(0).getLong(3) == 2L)
    assert(!byDoc.contains(3L))
  }

  test("robotsMeta: both attribute orders, token-not-substring match, " +
    "tagless page indexable") {
    val d = Seq(
      (1L, "<meta name=\"robots\" content=\"noindex,nofollow\">"),
      (2L, "<META CONTENT=\" noarchive \" NAME=\"robots\">"),
      (3L, "<meta name=\"robots\" content=\"noindexing\">"), // not a token
      (4L, "<p>no tag</p>")
    ).toDF("doc_id", "html")
    val out = TextAnalysis.robotsMeta(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("noindex") &&
      out(1L).getAs[Boolean]("nofollow") && !out(1L).getAs[Boolean]("noarchive"))
    assert(out(2L).getAs[Boolean]("noarchive") &&
      out(2L).getAs[String]("robots_content") == " noarchive ")
    assert(!out(3L).getAs[Boolean]("noindex"))
    assert(out(4L).isNullAt(1) && !out(4L).getAs[Boolean]("noindex"))
  }

  test("sq8Quantize: floor codes hit 0 and 255 at the range ends, " +
    "constant vector codes to zeros with zero error bound") {
    val d = Seq(
      (1L, Seq(0.0, 10.5, 21.0)),
      (2L, Seq(7.0, 7.0, 7.0))
    ).toDF("emb_id", "vec")
    val out = Similarity.sq8Quantize(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getSeq[Int](1) == Seq(0, 127, 255))
    assert(r1.getDouble(2) == 0.0 && r1.getDouble(3) == 21.0)
    assert(r1.getDouble(4) == 21.0 / 255.0)
    val r2 = out(2L)
    assert(r2.getSeq[Int](1) == Seq(0, 0, 0) && r2.getDouble(4) == 0.0)
  }

  test("bitextMine: pure-direction target beats the mixed distractor, " +
    "margin accept needs a beaten neighborhood, decisions deterministic") {
    // dim 2, planes 2: direction-0 sources, a perfect target (id 0),
    // a 0.6/0.8 distractor (id 1) sharing sign pattern [+,+]
    val src = Seq((10L, Seq(2.0, 0.0)), (11L, Seq(3.0, 0.0)))
      .toDF("src_id", "embedding")
    val tgt = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.6, 0.8)))
      .toDF("tgt_id", "embedding")
    val out = Similarity.bitextMine(src, tgt, planes = 2, dim = 2, k = 4,
        threshold = 1.02)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(10L, 11L))
    for (r <- out.values) {
      assert(r.getLong(1) == 0L)   // the pure target wins
      // accept depends on whether the distractor shares the bucket;
      // both sources must DECIDE identically (same direction)
    }
    assert(out(10L).getBoolean(3) == out(11L).getBoolean(3))
  }
}
