package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.catalog.SchemaCatalog
import graft.ops.TreeWalk

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` exercises one operator family from
  * SURVEY.md §2; `oracleSql` carries the equivalent ANSI SQL the driver
  * runs in DuckDB over the same parquet tables. Column names and
  * orderings are aligned on both sides; money arithmetic goes through
  * DECIMAL(18,4) before summing so Spark's partition-order-dependent
  * double summation cannot diverge from DuckDB's.
  */
object SparkEntry {

  /** Flagship: the copy-tree walk (reference's core operation) on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_copy_tree")(spark, "/root/testdata/sf0.001")

  // exact money arithmetic: double → decimal before aggregation
  private def dec(c: Column): Column = c.cast("decimal(18,4)")
  private def dbl(c: Column): Column = c.cast("double")

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1/P1: full scan with explicit projection (exportTable,
    // CopyUtils.java:682-710) — pruned read, no shuffle.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dbl(sum(dec(col("l_quantity")))).as("sum_qty"),
          dbl(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          dbl(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("sum_disc_price"),
          (dbl(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // S2/F1: keyed IN-list scan (exportTableBatch, CopyUtils.java:621-670)
    "q02_inlist_scan" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_orderkey").isin(1L, 7L, 32L, 66L, 97L, 128L, 193L, 256L))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J1/J3: the copy-tree walk — chained left-semi joins from root
    // customer ids through orders into lineitem (walkLinked,
    // CopyUtils.java:533-574).
    "q03_copy_tree" -> ((s, dir) => {
      val sels = TreeWalk.selectAlongPath(
        s, name => t(s, dir, name),
        paths = Seq("customer->orders.o_custkey", "orders->lineitem.l_orderkey"),
        pks = SchemaCatalog.walkPks,
        rootTable = "customer",
        rootIds = (1L to 10L))
      val lineitemSel = sels.last
      TreeWalk.selectRows(name => t(s, dir, name), lineitemSel)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // J4/K5 query form: delete-tree = anti join (deleteSelections,
    // CopyUtils.java:23-31; DeleteByPk.java:15-43)
    "q04_delete_tree" -> ((s, dir) => {
      val loader = (name: String) => t(s, dir, name)
      val sels = TreeWalk.selectAlongPath(
        s, loader,
        paths = Seq("customer->orders.o_custkey"),
        pks = SchemaCatalog.walkPks,
        rootTable = "customer",
        rootIds = (1L to 10L))
      TreeWalk.antiRows(loader, sels.last)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
    }),

    // J1: semi join against a filtered dimension (findLinkedRows,
    // CopyUtils.java:480-531)
    "q05_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 9000.0)
      o.join(c, o("o_custkey") === c("c_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    }),

    // O: top-k with deterministic tiebreak (TakeOrderedAndProject)
    "q06_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // window functions: running totals per customer
    "q07_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("run_total",
          dbl(sum(dec(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, 0))))
        .select("o_custkey", "o_orderkey", "rn", "run_total")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // rollup over the region→nation→customer→orders join
    "q08_rollup" -> ((s, dir) => {
      val r = t(s, dir, "region"); val n = t(s, dir, "nation")
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(dbl(sum(dec(col("o_totalprice")))).as("total_sales"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    }),

    // multi-way join with broadcast dims (TPC-H Q5 shape)
    "q10_join_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer"); val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem"); val sup = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") && c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dbl(sum(dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),
  )

  /** DuckDB-equivalent SQL per query (same column names, same ordering,
    * same DECIMAL(18,4) money arithmetic). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_inlist_scan" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  l_quantity, l_extendedprice, l_returnflag, l_shipdate
        |FROM lineitem
        |WHERE l_orderkey IN (1, 7, 32, 66, 97, 128, 193, 256)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_copy_tree" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_custkey IN (
        |    SELECT c_custkey FROM customer WHERE c_custkey BETWEEN 1 AND 10))
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q04_delete_tree" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_orderkey NOT IN (
        |  SELECT o_orderkey FROM orders WHERE o_custkey IN (
        |    SELECT c_custkey FROM customer WHERE c_custkey BETWEEN 1 AND 10))
        |ORDER BY o_orderkey""".stripMargin,

    "q05_semi_join" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
        |ORDER BY o_orderkey""".stripMargin,

    "q06_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q07_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  ROW_NUMBER() OVER w AS rn,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q08_rollup" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_sales,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin,

    "q10_join_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
  )
}
