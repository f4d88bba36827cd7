package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DML writers as set operations (SURVEY.md §2.2 K4/K5).
  *
  * The reference upserts row-by-row — `UPDATE … WHERE pk=?`, 0 rows
  * updated → queue insert, >1 → hard error ("Was the wrong column given
  * as the primary key?", `CopyUtils.java:741-779`). In a distributed
  * engine the same contract becomes: pre-deduplicate same-key rows in
  * the delta (latest wins), then `delta ∪ (base ⋉̸ delta)` — one
  * shuffle on the pk, no per-row round-trips (SURVEY.md §7.4).
  *
  * Every operation takes the key as `Seq[String]`: the reference models
  * single-column keys only (it hard-errors on composite PKs,
  * `CopyUtils.java:410-412`); here a composite key is just more key
  * columns in the same set algebra. Single-column `String` overloads
  * keep the common call sites terse.
  */
object Writers {

  /** Latest-wins dedup of the delta by pk. `orderBy` defines "latest"
    * (e.g. a version/timestamp column, descending); when absent, a
    * deterministic total order over all non-pk columns is used so the
    * result does not depend on partitioning.
    */
  def dedupLatest(delta: DataFrame, pk: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val ord =
      if (orderBy.nonEmpty) orderBy
      else delta.columns.filterNot(pk.contains).toSeq.map(c => col(c).desc_nulls_last)
    if (ord.isEmpty) delta.dropDuplicates(pk)
    else {
      val w = Window.partitionBy(pk.map(col): _*).orderBy(ord: _*)
      delta.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }
  }

  def dedupLatest(delta: DataFrame, pk: String, orderBy: Seq[Column] = Nil): DataFrame =
    dedupLatest(delta, Seq(pk), orderBy)

  /** Upsert (update-else-insert, K4): rows of `delta` replace same-pk
    * rows of `base`; new pks are appended. The reference's 0/1-row
    * invariant is honored by construction: `assertUniquePk` is the
    * distributed form of its >1-rows-updated error. */
  def upsert(base: DataFrame, delta: DataFrame, pk: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val d = dedupLatest(delta, pk, orderBy)
    d.unionByName(base.join(d.select(pk.map(col): _*), pk, "left_anti"))
  }

  def upsert(base: DataFrame, delta: DataFrame, pk: String, orderBy: Seq[Column] = Nil): DataFrame =
    upsert(base, delta, Seq(pk), orderBy)

  /** Distributed form of the reference's "exactly 0 or 1 rows updated"
    * invariant (`CopyUtils.java:763-767`): error if `pk` is not unique
    * in `df`. One aggregation; call on base tables before upserting. */
  def assertUniquePk(df: DataFrame, pk: Seq[String]): Unit = {
    val dup = df.groupBy(pk.map(col): _*).count().filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty) {
      val v = pk.indices.map(dup(0).get).mkString(", ")
      sys.error(s"Duplicate value ($v) for primary key ${pk.mkString(",")} — was the wrong column given as the primary key?")
    }
  }

  def assertUniquePk(df: DataFrame, pk: String): Unit = assertUniquePk(df, Seq(pk))

  /** Delete-by-pk (K5) in query form: anti join. `keys` columns align
    * positionally with `pk`. */
  def deleteByPk(base: DataFrame, keys: DataFrame, pk: Seq[String]): DataFrame =
    base.join(keys.toDF(pk: _*).distinct(), pk, "left_anti")

  def deleteByPk(base: DataFrame, keys: DataFrame, pk: String): DataFrame =
    deleteByPk(base, keys, Seq(pk))
}
