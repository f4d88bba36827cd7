package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path join utilities (SURVEY.md §4; builder north star —
  * "would this hold at 1000× the data?").
  *
  * - [[saltedJoin]]: the skew treatment when one join key dominates
  *   (a handful of hot keys would pin single reducers at 100 TB). The
  *   large side gets a random-but-bounded salt; the small side is
  *   exploded `saltFactor`× so every salted key still finds its match.
  *   AQE's skew-join handles moderate skew automatically; salting is
  *   the explicit tool for extreme generator-style skew.
  * - [[bucketedWrite]]/co-located joins: pre-shuffling both sides into
  *   the same bucketing eliminates the per-query shuffle entirely —
  *   the right layout for repeated large-large joins (fact-to-fact at
  *   100 TB). Requires a catalog table (bucket metadata lives there).
  */
object Scale {

  /** Join `large ⋈ small` on `key` with salting: large rows get salt
    * ∈ [0, saltFactor); small rows are replicated once per salt value.
    * Result equals the plain inner join, but the shuffle spreads each
    * hot key over `saltFactor` reducers. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    // deterministic salt (hash of the whole row, not rand()): reruns and
    // speculative retries place rows identically
    val salted = large.withColumn("__salt",
      pmod(hash(large.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    val joined = salted.join(replicated,
      salted(key) === replicated(key) && salted("__salt") === replicated("__salt"))
    joined.drop("__salt").drop(replicated(key))
  }

  /** Write `df` as a bucketed, sorted catalog table: both sides of a
    * repeated equi-join bucketed the same way join with zero shuffle. */
  def bucketedWrite(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table) // managed table in the warehouse

  /** Per-key EXACT discrete quantile — the value at sorted position
    * `k = ceil(p·n)` within each key's multiset — without ever sorting
    * a whole stratum. Output: (keyCol, n, k, quantile).
    *
    * Spark's exact `percentile` aggregate buffers every value of a
    * group in one aggregator (the q47 path — fine for model-sized
    * groups, a single-task OOM at 100 TB per-source strata), and a
    * `row_number().over(Window.partitionBy(key))` rank sorts each
    * entire stratum in one task. This is the two-pass histogram form
    * instead (same shape as `Corpus.tokenBudgetSample`):
    *
    *  1. per-key min/max/count (cheap map-side-combined aggregate);
    *  2. each value maps to one of `nBuckets` equi-width buckets —
    *     `floor((v-mn)/(mx-mn)·nBuckets)` is monotone in v under IEEE
    *     (subtraction then division/multiplication by a positive
    *     constant preserve order), so bucket order IS value order;
    *     a per-(key, bucket) count histogram plus a prefix sum over
    *     the ≤nBuckets-row-per-key bucket table locates the ONE
    *     bucket containing position k;
    *  3. only that boundary bucket's rows are revisited, aggregated
    *     to per-DISTINCT-value counts (so duplicate-heavy buckets
    *     stay small), and a cumulative count ordered by value picks
    *     the smallest value whose cumulative position reaches k.
    *
    * Every shuffle is keyed; the only windows run over the bucket
    * table (≤nBuckets rows/key) and the boundary bucket's distinct
    * values (~1/nBuckets of a stratum's value diversity). Ties are
    * exact: position k in the multiset is well-defined and the VALUE
    * there is deterministic regardless of how equal values tie-break.
    *
    * Boundary semantics: `k = ceil(p·n)` over the stratum's multiset,
    * so `p = 1` is the stratum max and any `p > 0` yields `k ≥ 1`
    * (the min for `p ≤ 1/n`).
    *
    * Non-finite values FAIL FAST: NaN poisons the equi-width bucket
    * arithmetic (`floor((v−mn)/(mx−mn)·nBuckets)` maps it to a null
    * bucket, silently breaking the n-vs-k accounting) and a ±Inf
    * collapses every finite row into one bucket — both would return a
    * WRONG quantile rather than a worse plan, so a stratum containing
    * NaN/±Inf (or a null value) raises at execution time. Filter or
    * clamp upstream; a quantile over non-finite data is ill-defined.
    *
    * Reference scope: the reference has no quantile surface; this
    * backs the corpus-curation cutoffs (perplexity filtering,
    * quality-score thresholds) that need "the exact p-quantile per
    * source" at crawl scale. */
  def kthSmallestByKey(df: DataFrame, valueCol: String, keyCol: String,
                       p: Double, nBuckets: Int = 1024): DataFrame =
    kthSmallestByKeyMulti(df, valueCol, keyCol, Seq(p), nBuckets)
      .select(col(keyCol), col("n"), col("k"), col("quantile"))

  /** [[kthSmallestByKey]] for SEVERAL quantiles of the same strata in
    * ONE set of passes — the stats scan, the histogram and its bucket
    * prefix sum are shared across every `p`; only the boundary-bucket
    * revisit runs per (key, p) (and two ps landing in the same bucket
    * share its rows). Callers needing q1/median/q3 or per-dim lo/hi
    * cuts previously re-ran the whole machinery per cut — at corpus
    * scale that is |ps| redundant scans of the value stream, at bench
    * scale |ps| redundant plans. Output (keyCol, p, n, k, quantile),
    * one row per stratum × requested p; `p` is echoed exactly as
    * passed, so callers can pivot on it. */
  def kthSmallestByKeyMulti(df: DataFrame, valueCol: String, keyCol: String,
                            ps: Seq[Double], nBuckets: Int = 1024): DataFrame = {
    require(ps.nonEmpty, "need at least one quantile")
    ps.foreach(p => require(p > 0.0 && p <= 1.0, s"p must be in (0, 1], got $p"))
    require(ps.distinct.size == ps.size, s"duplicate quantiles in $ps")
    require(nBuckets > 0)
    require(!Set("n", "k", "p", "quantile").contains(keyCol),
      s"keyCol '$keyCol' collides with an output column name")
    import org.apache.spark.sql.expressions.Window
    // the (key, value) projection feeds three passes (stats, histogram,
    // boundary revisit); materialize it ONCE so the upstream pipeline —
    // which may be an expensive computation, not a table scan — is
    // evaluated a single time (the documented stage-boundary persist
    // point, same as the LM occurrence stream)
    val base = df.select(col(keyCol), col(valueCol).cast("double").as("__v"))
      .localCheckpoint()
    val stats = base.groupBy(col(keyCol))
      .agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
        count(lit(1)).as("__n"),
        sum(when(col("__v").isNull || isnan(col("__v")) ||
          col("__v") === Double.PositiveInfinity ||
          col("__v") === Double.NegativeInfinity, 1L).otherwise(0L))
          .as("__bad"))
      // the fail-fast lives inside __k (an always-consumed column) so
      // the optimizer cannot prune it away
      .withColumn("__ks", array(ps.map(p => struct(
        lit(p).as("p"),
        when(col("__bad") > 0, raise_error(concat(
          lit("kthSmallestByKey: non-finite or null values in stratum '"),
          col(keyCol).cast("string"),
          lit("' — filter or clamp NaN/Inf/null upstream"))).cast("long"))
          .otherwise(ceil(lit(p) * col("__n")).cast("long")).as("k"))): _*))
    // key-join of the data against the model-sized stats table; AQE
    // broadcasts stats when the key count is small
    val bucketed = base
      .join(stats.select(col(keyCol), col("__mn"), col("__mx")), Seq(keyCol))
      .withColumn("__b",
        when(col("__mx") === col("__mn"), lit(0))
          .otherwise(least(
            floor((col("__v") - col("__mn")) / (col("__mx") - col("__mn"))
              * nBuckets),
            lit(nBuckets - 1)))
          .cast("int"))
    val wb = Window.partitionBy(col(keyCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-(key, p) boundary bucket: the shared histogram + prefix sum,
    // the per-p target positions unpacked from the stats row
    val boundary = bucketed.groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("__cb"))
      .withColumn("__prev", coalesce(sum(col("__cb")).over(wb), lit(0L)))
      .join(stats.select(col(keyCol), explode(col("__ks")).as("__pk")),
        Seq(keyCol))
      .filter(col("__prev") < col("__pk.k") &&
        col("__prev") + col("__cb") >= col("__pk.k"))
      .select(col(keyCol), col("__b"), col("__prev"),
        col("__pk.p").as("p"), col("__pk.k").as("__k"))
    val wv = Window.partitionBy(col(keyCol), col("p")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val kth = bucketed.select(col(keyCol), col("__b"), col("__v"))
      .join(boundary, Seq(keyCol, "__b"))
      .groupBy(col(keyCol), col("p"), col("__v"), col("__prev"), col("__k"))
      .agg(count(lit(1)).as("__cv"))
      .withColumn("__cum", col("__prev") + sum(col("__cv")).over(wv))
      .filter(col("__cum") >= col("__k"))
      .groupBy(col(keyCol), col("p")).agg(min(col("__v")).as("quantile"),
        max(col("__k")).as("k"))
    stats.select(col(keyCol), col("__n").as("n"))
      .join(kth, Seq(keyCol))
      .select(col(keyCol), col("p"), col("n"), col("k"), col("quantile"))
  }

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketed co-located joins buy. */
  def isShuffleFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    df.queryExecution.executedPlan
      .collect { case e: ShuffleExchangeLike => e }.isEmpty
  }
}
