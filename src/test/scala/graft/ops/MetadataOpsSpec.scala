package graft.ops

import graft.SparkSpec
import graft.catalog.SchemaCatalog
import graft.model.FkEdge

/** Toposort / path DSL / exclusion semantics, incl. the reference's
  * negative paths (FIXTURES.md §B).
  */
class MetadataOpsSpec extends SparkSpec {
  val tables = Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
  val edges = SchemaCatalog.starEdges

  test("toposort respects every FK edge") {
    val order = TopoSort.sort(tables, edges)
    assert(order.toSet == tables.toSet)
    val pos = order.zipWithIndex.toMap
    edges.foreach { e =>
      assert(pos(e.parentTable) < pos(e.childTable), s"${e.name} violated in $order")
    }
  }

  test("toposort detects cycles (reference: 'Could not make forward progress')") {
    val cyclic = edges :+ FkEdge("bad", "lineitem", "l_orderkey", "region", "r_regionkey")
    val e = intercept[RuntimeException](TopoSort.sort(tables, cyclic))
    assert(e.getMessage.toLowerCase.contains("cycle"))
  }

  test("toposort ignores self-FKs (reference: CopyUtils.java:586-587)") {
    val selfFk = edges :+ FkEdge("self", "nation", "n_nationkey", "nation", "n_regionkey")
    assert(TopoSort.sort(tables, selfFk).toSet == tables.toSet)
  }

  test("path DSL parses PARENT->CHILD.FKCOL") {
    val e = PathDsl.parse("customer->orders.o_custkey", SchemaCatalog.starPks)
    assert(e == FkEdge("customer->orders.o_custkey", "customer", "c_custkey", "orders", "o_custkey"))
  }

  test("path DSL errors on missing PK (reference: 'no PK for')") {
    val e = intercept[RuntimeException](
      PathDsl.parse("lineitem->orders.o_orderkey", SchemaCatalog.starPks))
    assert(e.getMessage.contains("no PK"))
  }

  test("path DSL rejects malformed paths") {
    intercept[RuntimeException](PathDsl.parse("customer~orders", SchemaCatalog.starPks))
  }

  test("edge exclusion drops an edge in either orientation (CopyUtils.java:460-469)") {
    val ex1 = Exclusions.filterRelationships(edges, Seq("lineitem.l_partkey=part.p_partkey"))
    assert(!ex1.exists(_.name == "fk_lineitem_part") && ex1.size == edges.size - 1)
    val ex2 = Exclusions.filterRelationships(edges, Seq("part.p_partkey=lineitem.l_partkey"))
    assert(!ex2.exists(_.name == "fk_lineitem_part") && ex2.size == edges.size - 1)
  }

  test("table exclusion is set difference (GradleUtils.groovy:18-23)") {
    assert(Exclusions.excludeTables(tables, Seq("lineitem", "nope")) ==
      tables.filterNot(_ == "lineitem"))
  }

  test("catalog lists tables and schemas from parquet footers") {
    val cat = new SchemaCatalog(spark, sf)
    assert(cat.tableNames.contains("lineitem") && cat.tableNames == cat.tableNames.sorted)
    val td = cat.tableDef("orders")
    assert(td.pk.contains("o_orderkey"))
    assert(td.columnNames.contains("o_totalprice"))
    assert(cat.tableDef("lineitem").pk.isEmpty) // the no-PK negative fixture
  }
}
