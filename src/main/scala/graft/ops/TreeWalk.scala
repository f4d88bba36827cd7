package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, lit}

import graft.model.{FkEdge, Selection}

/** FK-graph traversal: the reference's `copyTree`/`deleteTree` core
  * (`walkLinked`, `CopyUtils.java:533-574`; semi-join J1
  * `findLinkedRows`, `:480-531`).
  *
  * The reference walks edges in user-given path order, issuing one
  * batched `IN`-list SQL per 500 parent ids. Here each step is a single
  * distributed `left_semi` join: child ⋉ accumulated-parent-keys,
  * projecting the child PK. Key sets stay DataFrames end to end, so the
  * walk scales past driver memory; with AQE on, small key sets become
  * broadcast joins automatically, and the explicit `broadcast` hint is
  * applied when the caller marks the roots as small.
  *
  * Reference error semantics kept:
  * - an edge whose parent has no accumulated ids yet → hard error
  *   ("Could not find path to …", `CopyUtils.java:552-555`);
  * - a child table without a single-column PK → hard error
  *   ("no PK for …", `:562-564`).
  */
object TreeWalk {

  /** Walk `edges` in order from `roots` (table → single-column key DF),
    * returning one Selection per edge, in walk order.
    *
    * @param broadcastKeys hint key sets as broadcastable (small roots —
    *   the common copy-tree case). With false, Catalyst/AQE decides.
    * @param cache persist each key level (MEMORY_AND_DISK). Use when
    *   selections are consumed more than once (export: invariant count
    *   + payload write) and call [[release]] when the walk's outputs
    *   are no longer needed — persisted levels otherwise accumulate in
    *   the session for its whole lifetime. Pass false for single-shot
    *   query composition, where caching would only add bookkeeping.
    */
  def walkLinked(
      loader: String => DataFrame,
      edges: Seq[FkEdge],
      pks: Map[String, String],
      roots: Map[String, DataFrame],
      broadcastKeys: Boolean = true,
      cache: Boolean = true): Seq[Selection] = {

    val acc = scala.collection.mutable.Map.empty[String, DataFrame]
    roots.foreach { case (t, keys) =>
      require(keys.columns.length == 1, s"root keys for $t must be single-column")
      acc(t) = keys.toDF("__key").distinct()
    }

    val out = Seq.newBuilder[Selection]
    edges.foreach { edge =>
      val parentIds = acc.getOrElse(edge.parentTable,
        sys.error(s"Could not find path to ${edge.parentTable} (edge ${edge.name})"))
      val childPk = pks.getOrElse(edge.childTable,
        sys.error(s"There is no PK for ${edge.childTable}"))
      val keys = if (broadcastKeys) broadcast(parentIds) else parentIds
      val child = loader(edge.childTable)
      val childKeys = child
        .join(keys, child(edge.childColumn) === keys("__key"), "left_semi")
        .select(col(childPk))
        .distinct()
      // persist each level when reused: the Selection keeps the SAME
      // DataFrame that was persisted, so release() can unpersist it
      if (cache)
        childKeys.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out += Selection(edge.childTable, childPk, childKeys)
      acc(edge.childTable) = acc.get(edge.childTable) match {
        case Some(prev) => prev.union(childKeys.toDF("__key")).distinct()
        case None => childKeys.toDF("__key")
      }
    }
    out.result()
  }

  /** Unpersist every key level a walk cached. Call after the walk's
    * selections have been fully consumed (payloads written) — a
    * long-lived session otherwise leaks one cached level per edge per
    * walk invocation. */
  def release(selections: Seq[Selection]): Unit =
    selections.foreach(_.keys.unpersist(blocking = false))

  /** `copyTree` (`Main.java:142-155` → `selectAlongPath`,
    * `CopyUtils.java:50-57`): parse paths, seed the root table with a
    * literal id list, walk, and prepend the root's own selection. */
  def selectAlongPath(
      spark: SparkSession,
      loader: String => DataFrame,
      paths: Seq[String],
      pks: Map[String, String],
      rootTable: String,
      rootIds: Seq[Long],
      cache: Boolean = true): Seq[Selection] = {
    import spark.implicits._
    val rootPk = pks.getOrElse(rootTable, sys.error(s"There is no PK for $rootTable"))
    // keep only root ids that actually exist (the reference selects the
    // root rows by id too — absent ids select nothing)
    val rootKeys = loader(rootTable)
      .filter(col(rootPk).isin(rootIds.map(x => lit(x)): _*))
      .select(col(rootPk))
    val edges = PathDsl.parseAll(paths, pks)
    val walked = walkLinked(loader, edges, pks, Map(rootTable -> rootKeys), cache = cache)
    Selection(rootTable, rootPk, rootKeys) +: walked
  }

  /** The materialized rows of a selection — child ⋉ keys (J1 in query
    * form). Broadcast of the key side left to AQE. */
  def selectRows(loader: String => DataFrame, sel: Selection): DataFrame = {
    val t = loader(sel.table)
    t.join(sel.keys, t(sel.column) === sel.keys(sel.keyCol), "left_semi")
  }

  /** `deleteTree` in query form (J4): target rows whose key is NOT in
    * the selection — `left_anti` (`CopyUtils.java:23-31`,
    * `DeleteByPk.java:15-43`). */
  def antiRows(loader: String => DataFrame, sel: Selection): DataFrame = {
    val t = loader(sel.table)
    t.join(sel.keys, t(sel.column) === sel.keys(sel.keyCol), "left_anti")
  }
}
