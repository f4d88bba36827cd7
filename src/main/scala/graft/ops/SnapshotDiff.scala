package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot delta detection — the incremental-pipeline primitive that
  * turns two corpus snapshots into the added/removed/changed set, so
  * downstream stages (dedup index appends, re-embedding, re-scoring)
  * process the CHURN, not the corpus. The Spark-native generalization
  * of the reference's replayable dump stream
  * (`CopyUtils.java:367` replays a full snapshot; a 100 TB pipeline
  * replays deltas).
  *
  * Shape at scale: one equi full-outer join on the id — shuffled
  * hash/sort-merge at default layouts, SHUFFLE-FREE when both
  * snapshots are written bucketed by the id column (the layout a
  * periodic-snapshot pipeline should use); content comparison is a
  * narrow md5 over the selected columns, so the join carries
  * (id, 32-byte hash) per side, never the payload. Output is bounded
  * by the churn, not the snapshot size.
  */
object SnapshotDiff {

  /** Portable row-content hash: md5 over the 0x01-joined string forms
    * of `cols`. concat_ws SKIPS null columns (a null and an empty
    * string collide) — callers with nullable content columns should
    * coalesce to a sentinel first. */
  def contentHash(cols: Seq[String]): Column =
    md5(concat_ws("\u0001", cols.map(c => col(c).cast("string")): _*))

  /** Diff `next` against `prev` by `idCol`, comparing the md5 of
    * `contentCols`: rows only in `prev` → `removed`, only in `next` →
    * `added`, in both with differing content → `changed`. Unchanged
    * rows are filtered out — the output is the churn set.
    * Output: (idCol, status). */
  def diff(prev: DataFrame, next: DataFrame, idCol: String,
           contentCols: Seq[String]): DataFrame = {
    val a = prev.select(col(idCol), contentHash(contentCols).as("__ha"))
    val b = next.select(col(idCol), contentHash(contentCols).as("__hb"))
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__hb").isNull, lit("removed"))
          .when(col("__ha").isNull, lit("added"))
          .when(col("__ha") =!= col("__hb"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .filter(col("status") =!= "unchanged")
  }
}
