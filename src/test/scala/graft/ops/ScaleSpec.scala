package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join (skew treatment changes layout, not results)") {
    val orders = load("orders")
    val customer = load("customer").select("c_custkey", "c_nationkey")
    val plain = orders.join(customer, orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_nationkey")
    val salted = Scale.saltedJoin(orders, customer.withColumnRenamed("c_custkey", "o_custkey"),
      "o_custkey", saltFactor = 8)
      .select("o_orderkey", "c_nationkey")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bucketed co-located join runs shuffle-free; plain join shuffles both sides") {
    val o = load("orders").select("o_orderkey", "o_custkey", "o_totalprice")
    val l = load("lineitem").select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Scale.bucketedWrite(o, "b_orders", "o_orderkey", 4)
    Scale.bucketedWrite(l, "b_lineitem", "o_orderkey", 4)
    try {
      val bucketed = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      bucketed.count()
      assert(Scale.isShuffleFree(bucketed), "bucketed join should not shuffle")
      val plain = o.join(l, "o_orderkey")
      plain.count()
      assert(!Scale.isShuffleFree(plain) ||
        plain.queryExecution.executedPlan.toString.contains("Broadcast"),
        "plain join shuffles (or broadcasts at this tiny scale)")
      // same results either way
      assert(bucketed.exceptAll(plain).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
