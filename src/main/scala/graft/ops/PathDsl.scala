package graft.ops

import graft.model.FkEdge

/** Parser for the reference's traversal-path DSL `PARENT->CHILD.FKCOL`
  * (pattern at `CopyUtils.java:21`, parsing `:59-97`). The user-given
  * path order is the traversal order — kept deliberately explicit and
  * deterministic (SURVEY.md §4, "join ordering = user-supplied path
  * order").
  */
object PathDsl {
  private val Path = """(\w+)->(\w+)\.(\w+)""".r

  /** Parse one path string into an FK edge (child column named, parent
    * column resolved from the PK map by the caller). */
  def parse(path: String, pks: Map[String, String]): FkEdge = path match {
    case Path(parent, child, fkCol) =>
      val parentPk = pks.getOrElse(parent,
        sys.error(s"There is no PK for $parent"))
      FkEdge(path, parent, parentPk, child, fkCol)
    case _ =>
      sys.error(s"Path '$path' does not match PARENT->CHILD.FKCOL")
  }

  def parseAll(paths: Seq[String], pks: Map[String, String]): Seq[FkEdge] =
    paths.map(parse(_, pks))
}
