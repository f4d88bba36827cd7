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

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketed co-located joins buy. */
  def isShuffleFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    df.queryExecution.executedPlan
      .collect { case e: ShuffleExchangeLike => e }.isEmpty
  }
}
