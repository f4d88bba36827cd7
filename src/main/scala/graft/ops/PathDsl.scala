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

  /** [[parseAll]] over a composite-PK catalog. A path edge references
    * its parent through the parent's PK, which a single-column FK can
    * only do when that PK is single-column — a composite-PK *parent* is
    * rejected here (its children would need composite FKs, outside the
    * reference's edge model, `ForeignKeyRelationship.java:10-31`);
    * composite-PK *children* are fine (the walk selects their full PK).
    */
  def parseAllComposite(paths: Seq[String], pks: Map[String, Seq[String]]): Seq[FkEdge] =
    paths.map { path =>
      path match {
        case Path(parent, _, _) =>
          val parentPk = pks.getOrElse(parent, sys.error(s"There is no PK for $parent"))
          require(parentPk.length == 1,
            s"path '$path' walks out of $parent, whose PK (${parentPk.mkString(",")}) is composite — a single-column FK edge cannot reference it")
        case _ => ()
      }
      parse(path, pks.collect { case (t, Seq(c)) => t -> c })
    }
}
