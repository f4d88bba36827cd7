package graft.ops

import graft.model.FkEdge

/** Exclusion filters over metadata sets (SURVEY.md §2.3 F4/F5).
  *
  * - Table exclusion: set-difference of table lists
  *   (`GradleUtils.groovy:18-23`).
  * - FK-edge exclusion: drop edges matching `"child.col=parent.col"`
  *   strings in either orientation (`filterRelationships`,
  *   `CopyUtils.java:460-469`).
  */
object Exclusions {
  def excludeTables(tables: Seq[String], excluded: Seq[String]): Seq[String] =
    tables.filterNot(excluded.toSet)

  private def forms(e: FkEdge): Set[String] = Set(
    s"${e.childTable}.${e.childColumn}=${e.parentTable}.${e.parentColumn}",
    s"${e.parentTable}.${e.parentColumn}=${e.childTable}.${e.childColumn}")

  def filterRelationships(edges: Seq[FkEdge], exclusions: Seq[String]): Seq[FkEdge] = {
    val ex = exclusions.toSet
    edges.filterNot(e => forms(e).exists(ex.contains))
  }
}
