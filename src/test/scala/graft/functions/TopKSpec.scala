package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {

  test("topK matches window row_number on the orders table") {
    val o = load("orders")
    val viaAgg = o.groupBy(col("o_orderpriority"))
      .agg(TopK.topK(5, col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rnk"),
        col("s.id").as("o_orderkey"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = o
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"))
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
    assert(viaAgg.count() === viaWindow.count())
  }

  test("topK groups smaller than k return all rows, ranked") {
    import spark.implicits._
    val df = Seq(("a", 3.0, 1L), ("a", 9.0, 2L), ("b", 5.0, 3L))
      .toDF("key", "ord", "id")
    val got = df.groupBy($"key")
      .agg(TopK.topK(10, $"ord", $"id").as("top"))
      .select($"key", posexplode($"top").as(Seq("pos", "s")))
      .select($"key", $"pos", $"s.id".as("id"))
      .as[(String, Int, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(("a", 0, 2L), ("a", 1, 1L), ("b", 0, 3L)))
  }

  test("topK ties break toward the smaller id (ORDER BY ord DESC, id ASC parity)") {
    import spark.implicits._
    val df = Seq(("k", 7.0, 9L), ("k", 7.0, 2L), ("k", 7.0, 5L))
      .toDF("key", "ord", "id")
    val ids = df.groupBy($"key")
      .agg(TopK.topK(2, $"ord", $"id").as("top"))
      .select(explode($"top.id").as("id")).as[Long].collect().toSeq
    assert(ids === Seq(2L, 5L))
  }

  test("topK treats -0.0 and 0.0 as equal (Spark SQL double ordering)") {
    import spark.implicits._
    // Under plain Double.compare, 0.0 beats -0.0 and id 9 would win rank
    // 0; Spark SQL's compareDoubles treats them as equal, so the id
    // tiebreak must pick id 2 first.
    val df = Seq(("k", 0.0, 9L), ("k", -0.0, 2L), ("k", -1.0, 5L))
      .toDF("key", "ord", "id")
    val ids = df.groupBy($"key")
      .agg(TopK.topK(3, $"ord", $"id").as("top"))
      .select(explode($"top.id").as("id")).as[Long].collect().toSeq
    assert(ids === Seq(2L, 9L, 5L))
  }

  test("topK skips null-score rows instead of failing") {
    import spark.implicits._
    val df = Seq(("a", Some(3.0), 1L), ("a", None, 2L), ("a", Some(9.0), 3L))
      .toDF("key", "ord", "id")
    val ids = df.groupBy($"key")
      .agg(TopK.topK(5, $"ord", $"id").as("top"))
      .select(explode($"top.id").as("id")).as[Long].collect().toSeq
    assert(ids === Seq(3L, 1L))
  }

  test("topK aggregates partially before the shuffle (no full-table sort)") {
    val o = load("orders")
    val df = o.groupBy(col("o_orderpriority"))
      .agg(TopK.topK(3, col("o_totalprice"), col("o_orderkey")).as("top"))
    df.count()
    val p = df.queryExecution.executedPlan.toString
    // ObjectHashAggregate with a partial_ mode before the exchange: map
    // tasks reduce to ≤ k rows per key, the defining scale property
    assert(p.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$p")
    assert(p.toLowerCase.contains("partial_topk"), s"expected partial aggregation in:\n$p")
    assert(!p.contains("WindowExec") && !df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s
    }.exists(_.global), "per-key top-k must not globally sort the input")
  }
}
