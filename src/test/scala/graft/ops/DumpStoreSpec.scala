package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.catalog.SchemaCatalog
import graft.model.Operation._

/** Export → manifest → replay round-trip (SURVEY.md §1.4, §3.2/§3.3). */
class DumpStoreSpec extends SparkSpec {

  test("manifest round-trips all operation kinds") {
    val dir = Files.createTempDirectory("graft-dump").toString
    val ops = Seq(
      CreateOrReplace("t1", "CREATE TABLE t1 (a INT) USING parquet"),
      SqlList(Seq("SELECT 1", "SELECT 2")),
      TableLoad("t1", "payloads/t1"),
      TableUpsert("t1", "a", "payloads/t1_delta"),
      DeleteByPk("t1", "a", "payloads/t1_del"))
    DumpStore.writeManifest(spark, dir, ops)
    assert(DumpStore.readManifest(spark, dir) == ops)
  }

  test("exportAll → replay reproduces row multisets (export≡identity property)") {
    val dump = Files.createTempDirectory("graft-dump").toString
    val cat = new SchemaCatalog(spark, sf)
    val tables = Seq("region", "nation", "customer").map(cat.tableDef)
    val order = TopoSort.sort(tables.map(_.name), cat.fkEdges)
    DumpStore.exportAll(spark, load, tables, dump, order)

    val db = s"graft_replay_${System.nanoTime()}"
    DumpStore.replay(spark, dump, Some(db))
    try {
      tables.foreach { t =>
        val got = spark.table(s"$db.${t.name}")
        assert(got.count() == load(t.name).count(), t.name)
        assert(got.exceptAll(load(t.name)).isEmpty && load(t.name).exceptAll(got).isEmpty, t.name)
      }
    } finally {
      spark.catalog.setCurrentDatabase("default")
      spark.sql(s"DROP DATABASE $db CASCADE")
    }
  }

  test("exportSelections enforces the cardinality invariant and replays") {
    val dump = Files.createTempDirectory("graft-dump").toString
    val sels = TreeWalk.selectAlongPath(
      spark, load, Seq("customer->orders.o_custkey"), SchemaCatalog.walkPks, "customer", 1L to 5L)
    val ops = DumpStore.exportSelections(spark, load, sels, dump)
    assert(ops.map(_.kind).forall(_ == "table_load"))
    val expected = load("orders").filter(col("o_custkey").between(1, 5)).count()
    assert(spark.read.parquet(s"$dump/payloads/orders_1").count() == expected)
  }

  test("replay executes upsert and delete ops against the catalog") {
    import spark.implicits._
    val dump = Files.createTempDirectory("graft-dump").toString
    val db = s"graft_dml_${System.nanoTime()}"
    (1L to 10L).map(i => (i, s"v$i")).toDF("pk", "v")
      .write.mode("overwrite").parquet(s"$dump/payloads/b")
    (8L to 12L).map(i => (i, s"u$i")).toDF("pk", "v")
      .write.mode("overwrite").parquet(s"$dump/payloads/d")
    (1L to 3L).map(i => Tuple1(i)).toDF("pk")
      .write.mode("overwrite").parquet(s"$dump/payloads/del")
    val ops = Seq(
      CreateOrReplace("tbl", "CREATE TABLE tbl (pk BIGINT, v STRING) USING parquet"),
      TableLoad("tbl", "payloads/b"),
      TableUpsert("tbl", "pk", "payloads/d"),
      DeleteByPk("tbl", "pk", "payloads/del"))
    DumpStore.writeManifest(spark, dump, ops)
    DumpStore.replay(spark, dump, Some(db))
    try {
      val got = spark.table(s"$db.tbl").orderBy("pk").as[(Long, String)].collect()
      assert(got.length == 9) // 10 + 2 new - 3 deleted
      assert(got.head == ((4L, "v4")))
      assert(got.last == ((12L, "u12")))
      assert(got.contains((8L, "u8"))) // updated
    } finally {
      spark.catalog.setCurrentDatabase("default")
      spark.sql(s"DROP DATABASE $db CASCADE")
    }
  }
}
