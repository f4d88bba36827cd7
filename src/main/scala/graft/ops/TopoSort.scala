package graft.ops

import graft.model.FkEdge

/** Kahn topological sort of the FK DAG — replay must emit parents
  * before children (mirrors `orderTableDependencies`,
  * `CopyUtils.java:576-619`).
  *
  * Semantics kept from the reference: self-FKs (parent == child) are
  * ignored (`:586-587`); a round with no progress is a hard
  * "Suspected cycle" error (`:603-605`). This is a driver-side
  * metadata algorithm — table counts are tiny even on a 100 TB lake,
  * so a sequential loop is the right tool (SURVEY.md §2.6 O2).
  */
object TopoSort {
  def sort(tables: Seq[String], edges: Seq[FkEdge]): Seq[String] = {
    // dependencies: child -> set of parents that must precede it
    val realEdges = edges.filter(e => e.parentTable != e.childTable)
    var deps: Map[String, Set[String]] = tables.map { t =>
      t -> realEdges.filter(_.childTable == t).map(_.parentTable).toSet
        .intersect(tables.toSet)
    }.toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (deps.nonEmpty) {
      // sorted for deterministic output among ready peers
      val ready = deps.collect { case (t, d) if d.isEmpty => t }.toSeq.sorted
      if (ready.isEmpty)
        sys.error(s"Could not make forward progress ordering tables — suspected cycle among: ${deps.keys.toSeq.sorted.mkString(", ")}")
      out ++= ready
      deps = (deps -- ready).map { case (t, d) => t -> (d -- ready) }
    }
    out.toSeq
  }
}
