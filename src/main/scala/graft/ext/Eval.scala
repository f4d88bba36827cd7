package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation-data scoring: the answer-comparison metrics a training
  * pipeline runs to judge dataset ablations. Deterministic, exact
  * integers until the final divisions, narrow per-row HOF passes.
  */
object Eval {

  /** SQuAD-style answer scoring — the eval-data half of a training
    * pipeline (dataset ablations are judged by these numbers):
    * normalize (lowercase, punctuation → space, the three English
    * articles dropped, whitespace collapsed), then exact match =
    * any reference normalizes identically, and token F1 =
    * `2·overlap/(|pred| + |ref|)` maximized over references, with
    * overlap the exact MULTISET intersection of whitespace tokens
    * (per-token min of the two occurrence counts — the official
    * scorer's collections.Counter semantics). Both-empty pairs score
    * EM/F1 = 1 (the no-answer convention). Exact integers until the
    * one final division; in-row O(k²) token matching, bounded by
    * answer length; narrow, zero shuffle. */
  def evalScores(preds: DataFrame, idCol: String = "pred_id",
                 predCol: String = "pred",
                 refsCol: String = "refs"): DataFrame = {
    def norm(c: Column): Column =
      trim(regexp_replace(regexp_replace(regexp_replace(lower(c),
        "[^a-z0-9]+", " "), "\\b(a|an|the)\\b", " "), " +", " "))
    def toks(c: Column): Column =
      filter(split(norm(c), "[ ]+"), t => t =!= "")
    val p = toks(col(predCol))
    val np = size(p)
    val scored = transform(col(refsCol), ref => {
      val r = toks(ref)
      val nr = size(r)
      val overlap = aggregate(array_distinct(p), lit(0L), (acc, t) =>
        acc + least(size(filter(p, x => x === t)),
          size(filter(r, x => x === t))).cast("long"))
      struct(
        (norm(col(predCol)) === norm(ref)).as("em"),
        when(np === 0 && nr === 0, lit(1.0))
          .when(np === 0 || nr === 0, lit(0.0))
          .otherwise(overlap.cast("double") * 2.0 /
            (np + nr).cast("double")).as("f1"))
    })
    preds.select(col(idCol),
      coalesce(exists(scored, s => s.getField("em")), lit(false)).as("em"),
      coalesce(array_max(transform(scored, s => s.getField("f1"))),
        lit(0.0)).as("best_f1"),
      np.cast("long").as("n_pred_tokens"))
  }
}
