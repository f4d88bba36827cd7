package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.model.{FkEdge, TableDef}

/** Catalog over a directory of parquet tables — plays the role of the
  * reference's live Oracle dictionary scans (SURVEY.md §2.1 S3-S6:
  * `getObjectNames` `CopyUtils.java:279-311`, `getTableDefinition`
  * `:931-964`, `getPrimaryKeys` `:393-425`, `getFkRelationships`
  * `:427-458`).
  *
  * Table discovery goes through the Hadoop FileSystem API, so the same
  * code works on local disk, HDFS, or object storage on a cluster;
  * schemas come from parquet footers (no data read).
  */
final class SchemaCatalog(spark: SparkSession, dir: String,
                          pks: Map[String, String] = SchemaCatalog.starPks,
                          edges: Seq[FkEdge] = SchemaCatalog.starEdges) {

  /** S3: list table names (basename of each `<name>.parquet`), sorted
    * for a stable layout (mirrors `ExportToFileTask.groovy:32`). */
  def tableNames: Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .sorted
  }

  /** S4: schema from the parquet footer + single-column PK if known. */
  def tableDef(name: String): TableDef =
    TableDef(name, schemaOf(name), pks.get(name))

  def schemaOf(name: String): StructType =
    spark.read.parquet(s"$dir/$name.parquet").schema

  /** S5: single-column PK per table. The reference hard-errors on
    * multi-column PKs (`CopyUtils.java:410-412`); our map encodes only
    * single-column ones, so absence == "no PK" error path. */
  def primaryKeys: Map[String, String] = pks

  /** S6: FK edges of the schema. */
  def fkEdges: Seq[FkEdge] = edges

  /** The edges as a DataFrame — for set-oriented metadata queries
    * (exclusion anti-joins, toposort audits). */
  def fkEdgesDf: DataFrame = {
    import spark.implicits._
    edges.toDF()
  }
}

object SchemaCatalog {
  /** PK fixture from FIXTURES.md §B (lineitem deliberately has no
    * single-column PK — the reference's "no PK" negative path,
    * `CopyUtils.java:562-564`). */
  val starPks: Map[String, String] = Map(
    "region" -> "r_regionkey",
    "nation" -> "n_nationkey",
    "customer" -> "c_custkey",
    "supplier" -> "s_suppkey",
    "part" -> "p_partkey",
    "orders" -> "o_orderkey")

  /** Like starPks but with the working stand-in PK for lineitem used by
    * tree-walk tests (FIXTURES.md §B). */
  val walkPks: Map[String, String] = starPks + ("lineitem" -> "l_orderkey")

  /** FK edges of the star schema (FIXTURES.md §B). */
  val starEdges: Seq[FkEdge] = Seq(
    FkEdge("fk_nation_region", "region", "r_regionkey", "nation", "n_regionkey"),
    FkEdge("fk_customer_nation", "nation", "n_nationkey", "customer", "c_nationkey"),
    FkEdge("fk_supplier_nation", "nation", "n_nationkey", "supplier", "s_nationkey"),
    FkEdge("fk_orders_customer", "customer", "c_custkey", "orders", "o_custkey"),
    FkEdge("fk_lineitem_orders", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    FkEdge("fk_lineitem_part", "part", "p_partkey", "lineitem", "l_partkey"),
    FkEdge("fk_lineitem_supplier", "supplier", "s_suppkey", "lineitem", "l_suppkey"))
}
