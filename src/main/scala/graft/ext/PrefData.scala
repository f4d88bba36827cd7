package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference/RLHF-data preparation: structural validation of
  * preference pairs, per-model win rates from pairwise comparisons,
  * and multi-rater agreement (Fleiss' kappa) over annotation tables.
  * Validation is a narrow per-row pass; win rate and agreement are
  * exact-integer aggregations whose state is bounded by models ×
  * outcomes and items × labels respectively — nothing corpus-sized
  * is ever collected or re-shuffled.
  */
object PrefData {

  /** Structural validation for preference pairs (prompt, chosen,
    * rejected): independent flags — all three fields non-blank,
    * chosen ≠ rejected (byte-identical pairs carry zero preference
    * signal), plus exact char lengths and the `chosen_longer` bit
    * whose corpus mean IS the length-bias audit (reward models
    * famously overfit to length — a mean far from 0.5 flags it).
    * Narrow, zero shuffle. */
  def prefValidate(pairs: DataFrame, idCol: String = "pair_id",
                   promptCol: String = "prompt", chosenCol: String = "chosen",
                   rejectedCol: String = "rejected"): DataFrame = {
    val nb = length(trim(col(promptCol))) > 0 &&
      length(trim(col(chosenCol))) > 0 && length(trim(col(rejectedCol))) > 0
    val distinct = col(chosenCol) =!= col(rejectedCol)
    pairs.select(col(idCol),
      nb.as("non_blank"),
      distinct.as("distinct_pair"),
      length(col(chosenCol)).cast("long").as("n_chosen_chars"),
      length(col(rejectedCol)).cast("long").as("n_rejected_chars"),
      (length(col(chosenCol)) > length(col(rejectedCol)))
        .as("chosen_longer"),
      (nb && distinct).as("valid"))
  }

  /** Per-model win/loss/tie census from pairwise comparisons
    * (`model_a`, `model_b`, `winner` ∈ a | b | tie — the arena
    * format): each comparison explodes to its two participants with
    * an outcome, then ONE model-keyed exact-integer aggregation.
    * `win_frac` excludes ties from the denominator (the arena
    * convention), emitted as a single double division of exact
    * integers; rows with any other winner value are dropped (counted
    * nowhere — a malformed vote is not a tie). Output state is
    * model-bounded. */
  def winRate(comps: DataFrame, modelACol: String = "model_a",
              modelBCol: String = "model_b",
              winnerCol: String = "winner"): DataFrame = {
    val w = col(winnerCol)
    val perSide = comps.filter(w.isin("a", "b", "tie")).select(explode(array(
      struct(col(modelACol).as("model"),
        when(w === "a", "win").when(w === "b", "loss").otherwise("tie")
          .as("outcome")),
      struct(col(modelBCol).as("model"),
        when(w === "b", "win").when(w === "a", "loss").otherwise("tie")
          .as("outcome")))).as("s"))
      .select(col("s.model").as("model"), col("s.outcome").as("outcome"))
    perSide.groupBy("model").agg(
      count(when(col("outcome") === "win", 1)).as("n_wins"),
      count(when(col("outcome") === "loss", 1)).as("n_losses"),
      count(when(col("outcome") === "tie", 1)).as("n_ties"),
      count(lit(1)).as("n_comps"))
      .withColumn("win_frac",
        when(col("n_wins") + col("n_losses") > 0,
          col("n_wins").cast("double") /
            (col("n_wins") + col("n_losses")).cast("double")))
  }

  /** Fleiss' kappa over a rating table (`item`, `annotator`,
    * `label`) — the standard multi-rater chance-corrected agreement
    * for annotation-quality gates. Requires a constant rater count:
    * items whose rating count differs from the MODAL count are
    * EXCLUDED and counted in `n_excluded`, never silently mixed
    * (Fleiss is undefined across varying n). All moments are exact
    * integer sums — per-item label counts n_ij, Σn_ij², label
    * marginals (the marginal squares in DECIMAL(38,0) so huge tables
    * cannot wrap int64) — and kappa is ONE double expression over
    * them at the end: `P̄o = (Σ n_ij² − N·n) / (N·n·(n−1))`,
    * `P̄e = Σ_j (Σ_i n_ij)² / (N·n)²`,
    * `κ = (P̄o − P̄e) / (1 − P̄e)`. Output is ONE row
    * `(n_items, n_raters, n_excluded, po_num, po_den, pe_num,
    * pe_den, kappa)` with the pe fraction emitted as exact decimal
    * STRINGS (the hash contract carries no decimal columns) so a
    * reader can re-derive kappa without floats; kappa is null when
    * P̄e = 1 (a single label — chance correction undefined) or
    * n = 1. Two map-side-combined shuffles (item×label, then item)
    * plus one item-keyed join for the kept marginals; no per-item
    * state beyond its label histogram. */
  def fleissKappa(ratings: DataFrame, itemCol: String = "item_id",
                  annotCol: String = "annotator",
                  labelCol: String = "label"): DataFrame = {
    val cell = ratings.groupBy(col(itemCol).as("item"),
      col(labelCol).as("label")).agg(count(lit(1)).as("nij"))
    val perItem = cell.groupBy("item").agg(
      sum("nij").as("n"), sum(col("nij") * col("nij")).as("sq"))
    // modal rater count decides which items are in-contract; the
    // candidate set is tiny (distinct rating counts), ties break low
    val nMode = perItem.groupBy("n").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("n").asc).limit(1)
      .select(col("n").as("n_raters"))
    val tagged = perItem.join(broadcast(nMode))
    val kept = tagged.filter(col("n") === col("n_raters"))
    val dec = "decimal(38,0)"
    val marg = cell.join(kept.select("item"), "item")
      .groupBy("label").agg(sum("nij").as("mj"))
      .agg(coalesce(sum(col("mj").cast(dec) * col("mj").cast(dec)),
        lit(0L).cast(dec)).as("__pe_num"))
    val agg = kept.groupBy("n_raters").agg(
      count(lit(1)).as("n_items"), sum("sq").as("sumsq"))
    val nExcl = tagged.filter(col("n") =!= col("n_raters"))
      .agg(count(lit(1)).as("n_excluded"))
    val out = agg.join(broadcast(nExcl)).join(broadcast(marg))
    val peDen = (col("n_items").cast(dec) * col("n_raters")) *
      (col("n_items").cast(dec) * col("n_raters"))
    val po = (col("sumsq") - col("n_items") * col("n_raters"))
      .cast("double") /
      (col("n_items") * col("n_raters") * (col("n_raters") - 1L))
        .cast("double")
    val pe = col("__pe_num").cast("double") / peDen.cast("double")
    out.select(col("n_items"), col("n_raters"), col("n_excluded"),
      (col("sumsq") - col("n_items") * col("n_raters")).as("po_num"),
      (col("n_items") * col("n_raters") * (col("n_raters") - 1L))
        .as("po_den"),
      col("__pe_num").cast("string").as("pe_num"),
      peDen.cast("string").as("pe_den"),
      when(col("n_raters") > 1L && col("__pe_num").cast(dec) < peDen,
        (po - pe) / (lit(1.0) - pe)).as("kappa"))
  }
}
