package graft.ops

import java.sql.Connection

import graft.model.Operation
import graft.model.Operation.SqlList

/** Schema-object DDL beyond tables — the reference's
  * `exportSchemaOtherObjects` (`CopyUtils.java:996-1010`): procedures,
  * functions, views, triggers, sequences and packages are pulled from
  * the source's dictionary and appended to the dump stream as ordered
  * SQL lists, replayed verbatim on JDBC targets.
  *
  * There is no portable JDBC "give me the DDL" call (the reference
  * leans on Oracle's `dbms_metadata.GET_DDL`,
  * `CopyUtils.java:258-261`), so extraction is per-dialect: a
  * [[DdlDialect]] turns dictionary rows back into executable DDL text.
  * The Derby dialect reconstructs views from `SYS.SYSVIEWS`, sequences
  * from `SYS.SYSSEQUENCES`, routines from `SYS.SYSALIASES` and
  * triggers from `SYS.SYSTRIGGERS`. Object kinds with no dictionary
  * form (packages are Oracle-only) are carried as caller-supplied
  * statements, post-processed exactly like the reference: trigger text
  * gets the iterated `ALTER TRIGGER … ENABLE` strip
  * (`CopyUtils.java:106-124`) and the source-schema qualifier drop
  * (`:126-131`).
  */
object ObjectDdl {

  /** Dictionary → DDL extraction for one JDBC dialect. */
  trait DdlDialect {
    /** `CREATE VIEW` statements, lexicographically ordered by name. */
    def viewDdl(conn: Connection): Seq[String]
    /** `CREATE SEQUENCE` statements restarting at the current value
      * (the reference's extracted sequence DDL likewise carries the
      * live `START WITH`). */
    def sequenceDdl(conn: Connection): Seq[String]
    /** `CREATE PROCEDURE` statements; empty when the dialect cannot
      * round-trip routine DDL (callers then supply it opaquely). */
    def procedureDdl(conn: Connection): Seq[String] = Nil
    /** `CREATE FUNCTION` statements; same contract as procedures. */
    def functionDdl(conn: Connection): Seq[String] = Nil
    /** `CREATE TRIGGER` statements; same contract as procedures. */
    def triggerDdl(conn: Connection): Seq[String] = Nil
  }

  private def q(id: String): String = "\"" + id + "\""

  /** Derby (`SYS.*` dictionary). */
  object DerbyDialect extends DdlDialect {

    def viewDdl(conn: Connection): Seq[String] = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          """SELECT t.TABLENAME, v.VIEWDEFINITION
            |FROM SYS.SYSVIEWS v JOIN SYS.SYSTABLES t ON v.TABLEID = t.TABLEID
            |ORDER BY t.TABLENAME""".stripMargin)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        try while (rs.next()) {
          val name = rs.getString(1)
          val text = rs.getString(2).trim
          // Derby stores the full CREATE VIEW statement as issued; fall
          // back to wrapping if a dialect/version stores only the query
          buf += (if (text.toUpperCase.startsWith("CREATE ")) text
                  else s"CREATE VIEW ${q(name)} AS $text")
        } finally rs.close()
        buf.toSeq
      } finally st.close()
    }

    def sequenceDdl(conn: Connection): Seq[String] = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          """SELECT SEQUENCENAME, SEQUENCEDATATYPE, CURRENTVALUE,
            |  MINIMUMVALUE, MAXIMUMVALUE, INCREMENT
            |FROM SYS.SYSSEQUENCES ORDER BY SEQUENCENAME""".stripMargin)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        try while (rs.next()) {
          // SEQUENCEDATATYPE is a Derby TypeDescriptor UDT; its string
          // form is the SQL type name, possibly suffixed " NOT NULL"
          val dataType = String.valueOf(rs.getObject(2))
            .replaceAll("(?i)\\s+NOT\\s+NULL\\s*$", "")
          buf += s"CREATE SEQUENCE ${q(rs.getString(1))} AS $dataType " +
            s"START WITH ${rs.getLong(3)} INCREMENT BY ${rs.getLong(6)} " +
            s"MINVALUE ${rs.getLong(4)} MAXVALUE ${rs.getLong(5)}"
        } finally rs.close()
        buf.toSeq
      } finally st.close()
    }

    override def procedureDdl(conn: Connection): Seq[String] = routineDdl(conn, "P")
    override def functionDdl(conn: Connection): Seq[String] = routineDdl(conn, "F")

    /** Reconstruct `CREATE TRIGGER` DDL from `SYS.SYSTRIGGERS` — the
      * live-dictionary counterpart of the reference's
      * `dbms_metadata.GET_DDL('TRIGGER', …)` (`CopyUtils.java:208-276`),
      * closing the round-1..4 gap where trigger text had to be
      * caller-supplied. Derby stores the pieces, not the statement:
      * event/firing-time/granularity flags, the REFERENCING names, the
      * optional WHEN clause and the action text, reassembled here in
      * the grammar's order. `UPDATE OF` column lists come back as
      * column NUMBERS (`REFERENCEDCOLUMNS`), resolved against
      * `SYS.SYSCOLUMNS` per trigger. */
    override def triggerDdl(conn: Connection): Seq[String] = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          """SELECT tr.TRIGGERNAME, tr.EVENT, tr.FIRINGTIME, tr.TYPE,
            |  t.TABLENAME, tr.REFERENCEDCOLUMNS, tr.TRIGGERDEFINITION,
            |  tr.REFERENCINGOLD, tr.REFERENCINGNEW,
            |  tr.OLDREFERENCINGNAME, tr.NEWREFERENCINGNAME,
            |  tr.WHENCLAUSETEXT, CAST(tr.TABLEID AS CHAR(36)) AS TID
            |FROM SYS.SYSTRIGGERS tr
            |JOIN SYS.SYSTABLES t ON tr.TABLEID = t.TABLEID
            |ORDER BY tr.TRIGGERNAME""".stripMargin)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        try while (rs.next()) {
          val firing =
            if (rs.getString(3).trim == "B") "NO CASCADE BEFORE" else "AFTER"
          val ofCols = Option(rs.getObject(6)).map { rc =>
            // ReferencedColumns stringifies as "(n[,m…])" 1-based column
            // numbers; map them to names through the table's dictionary
            val nums = String.valueOf(rc).replaceAll("[()\\s]", "")
              .split(",").filter(_.nonEmpty).map(_.toInt).toSeq
            s" OF ${nums.map(n => q(columnName(conn, rs.getString(13), n))).mkString(", ")}"
          }.getOrElse("")
          val event = rs.getString(2).trim match {
            case "U" => s"UPDATE$ofCols"
            case "D" => "DELETE"
            case _   => "INSERT"
          }
          val referencing = {
            val olds = if (rs.getBoolean(8)) Seq(s"OLD AS ${q(rs.getString(10))}") else Nil
            val news = if (rs.getBoolean(9)) Seq(s"NEW AS ${q(rs.getString(11))}") else Nil
            val both = olds ++ news
            if (both.isEmpty) "" else s" REFERENCING ${both.mkString(" ")}"
          }
          val each = if (rs.getString(4).trim == "R") "ROW" else "STATEMENT"
          val when =
            Option(rs.getString(12)).map(w => s" WHEN ($w)").getOrElse("")
          buf += s"CREATE TRIGGER ${q(rs.getString(1))} $firing $event " +
            s"ON ${q(rs.getString(5))}$referencing FOR EACH $each$when " +
            rs.getString(7).trim
        } finally rs.close()
        buf.toSeq
      } finally st.close()
    }

    private def columnName(conn: Connection, tableId: String, num: Int): String = {
      val st = conn.prepareStatement(
        """SELECT COLUMNNAME FROM SYS.SYSCOLUMNS
          |WHERE CAST(REFERENCEID AS CHAR(36)) = ? AND COLUMNNUMBER = ?""".stripMargin)
      try {
        st.setString(1, tableId)
        st.setInt(2, num)
        val rs = st.executeQuery()
        try { require(rs.next(), s"no column $num in table $tableId"); rs.getString(1) }
        finally rs.close()
      } finally st.close()
    }

    /** Reconstruct routine DDL from `SYS.SYSALIASES` the way dblook
      * does: `ALIASINFO`'s string form is
      * `<javaMethod>(<signature and attributes>)`, so the DDL is
      * `CREATE {PROCEDURE|FUNCTION} "<alias>"<signature…>
      * EXTERNAL NAME '<javaClass>.<javaMethod>'`. System schemas are
      * excluded (they hold Derby's own metadata routines). */
    private def routineDdl(conn: Connection, aliasType: String): Seq[String] = {
      val kind = if (aliasType == "P") "PROCEDURE" else "FUNCTION"
      val st = conn.prepareStatement(
        """SELECT a.ALIAS, a.JAVACLASSNAME, a.ALIASINFO
          |FROM SYS.SYSALIASES a JOIN SYS.SYSSCHEMAS s ON a.SCHEMAID = s.SCHEMAID
          |WHERE s.SCHEMANAME NOT LIKE 'SYS%' AND s.SCHEMANAME <> 'SQLJ'
          |  AND a.ALIASTYPE = ?
          |ORDER BY a.ALIAS""".stripMargin)
      try {
        st.setString(1, aliasType)
        val rs = st.executeQuery()
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        try while (rs.next()) {
          val info = String.valueOf(rs.getObject(3))
          val method = info.substring(0, info.indexOf('('))
          buf += s"CREATE $kind ${q(rs.getString(1))}${info.substring(method.length)} " +
            s"EXTERNAL NAME '${rs.getString(2)}.$method'"
        } finally rs.close()
        buf.toSeq
      } finally st.close()
    }
  }

  /** Extract the non-table object surface of a live JDBC schema as
    * dump-stream operations, in the reference's emission order
    * (procedures → functions → views → triggers → sequences →
    * packages, `CopyUtils.java:998-1010`). Dictionary-derived kinds
    * come from `dialect`; opaque kinds are caller-supplied and
    * normalized here. Returns at most one [[SqlList]] — empty schemas
    * produce no operation. */
  def exportOtherObjects(
      url: String,
      dialect: DdlDialect = DerbyDialect,
      srcSchema: Option[String] = None,
      procedureDdl: Seq[String] = Nil,
      functionDdl: Seq[String] = Nil,
      triggerDdl: Seq[String] = Nil,
      packageDdl: Seq[String] = Nil): Seq[Operation] = {
    val conn = java.sql.DriverManager.getConnection(url)
    val extracted =
      try (dialect.procedureDdl(conn) ++ procedureDdl) ++
        (dialect.functionDdl(conn) ++ functionDdl) ++
        dialect.viewDdl(conn) ++
        (dialect.triggerDdl(conn) ++
          triggerDdl.map(SqlText.stripTrailingAlterTriggerEnable)) ++
        dialect.sequenceDdl(conn) ++
        packageDdl
      finally conn.close()
    val stmts = srcSchema.fold(extracted)(s => extracted.map(SqlText.dropSchemaName(_, s)))
    if (stmts.isEmpty) Nil else Seq(SqlList(stmts))
  }
}
