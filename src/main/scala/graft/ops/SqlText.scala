package graft.ops

/** SQL-text rewrite utilities carried over from the reference's DDL
  * normalization (SURVEY.md §2.8 X2/X3): schema-qualifier stripping and
  * iterated trailing-statement removal. In this engine they apply to
  * opaque SQL carried in dump manifests (SqlList operations).
  */
object SqlText {

  /** Remove `"SCHEMA".` qualifiers from a SQL string (the reference's
    * `dropSchemaName`, `CopyUtils.java:126-131`) — case-insensitive on
    * the schema name, which the reference upper-cases (X4). */
  def dropSchemaName(sql: String, schema: String): String =
    sql.replaceAll("(?i)\"" + java.util.regex.Pattern.quote(schema.toUpperCase) + "\"\\.", "")

  /** Iteratively strip trailing `ALTER TRIGGER … ENABLE` statements
    * (the reference's `stripOutTriggerDDL`, `CopyUtils.java:106-124`:
    * loop with a DOTALL pattern until no match). */
  def stripTrailingAlterTriggerEnable(sql: String): String = {
    val p = "(?is)(.*?)\\s*ALTER\\s+TRIGGER\\s+\\S+\\s+ENABLE\\s*;?\\s*$".r
    var cur = sql
    var changed = true
    while (changed) {
      cur match {
        case p(rest) if rest != cur => cur = rest
        case _ => changed = false
      }
    }
    cur
  }

  /** Generic list partitioner (B1, `CopyUtils.java:517-523`): chunk a
    * sequence into groups of at most `n`. Driver-side batching helper
    * for statement generation; concat of the output is the input. */
  def partition[A](xs: Seq[A], n: Int): Seq[Seq[A]] = {
    require(n > 0, "partition size must be positive")
    xs.grouped(n).toSeq
  }
}
