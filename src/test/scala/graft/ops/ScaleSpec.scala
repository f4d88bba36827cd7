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

  // naive reference: the value at sorted position ceil(p*n) per key
  private def naiveKth(rows: Seq[(String, Double)], p: Double): Map[String, Double] =
    rows.groupBy(_._1).map { case (k, vs) =>
      val sorted = vs.map(_._2).sorted
      k -> sorted(math.ceil(p * sorted.size).toLong.toInt - 1)
    }

  test("kthSmallestByKey equals the naive per-key sort, ties and skew included") {
    // key "mega" holds ~90% of the rows (the stratum the histogram form
    // exists for); "dup" is duplicate-heavy; "one" is a single row
    val rows: Seq[(String, Double)] =
      (1 to 9000).map(i => ("mega", (i % 977).toDouble / 3.0)) ++
      (1 to 900).map(i => ("dup", (i % 7).toDouble)) ++
      Seq(("one", 42.0))
    val df = rows.toDF("key", "v")
    for (p <- Seq(0.1, 0.25, 0.5, 0.9, 1.0)) {
      val got = Scale.kthSmallestByKey(df, "v", "key", p)
        .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
      assert(got == naiveKth(rows, p), s"p=$p")
    }
  }

  test("kthSmallestByKey handles an all-equal stratum (zero value range)") {
    val df = Seq.fill(100)(("flat", 5.5)).toDF("key", "v")
    val r = Scale.kthSmallestByKey(df, "v", "key", 0.5).collect().head
    assert(r.getLong(1) == 100 && r.getLong(2) == 50 && r.getDouble(3) == 5.5)
  }

  test("kthSmallestByKey fails fast on NaN/Inf/null instead of returning a " +
    "wrong quantile; clean strata in the same frame don't mask it") {
    for (poison <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)) {
      val df = (Seq(("clean", 1.0), ("clean", 2.0), ("clean", 3.0)) ++
        Seq(("bad", 1.0), ("bad", poison))).toDF("key", "v")
      val e = intercept[Exception] {
        Scale.kthSmallestByKey(df, "v", "key", 0.5).collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(c =>
        Option(c.getMessage).exists(_.contains("kthSmallestByKey"))),
        s"expected the fail-fast message for poison=$poison, got: $e")
    }
    val withNull = Seq(("bad", Some(1.0)), ("bad", None))
      .toDF("key", "v")
    val e = intercept[Exception] {
      Scale.kthSmallestByKey(withNull, "v", "key", 0.5).collect()
    }
    assert(e.toString.contains("kthSmallestByKey") ||
      Option(e.getCause).exists(_.toString.contains("kthSmallestByKey")))
  }

  test("kthSmallestByKey single-value stratum and p boundaries") {
    val df = Seq(("one", 42.0)).toDF("key", "v")
    for (p <- Seq(0.001, 0.5, 1.0)) {
      val r = Scale.kthSmallestByKey(df, "v", "key", p).collect().head
      assert(r.getAs[Double]("quantile") == 42.0 && r.getAs[Long]("k") == 1L)
    }
  }

  test("kthSmallestByKey boundary window sees one bucket, not the stratum") {
    // with 4 buckets over values 0..99, the p=0.5 boundary bucket holds
    // ~25 of 100 distinct values — assert the second-pass input really
    // is bucket-sized by checking the quantile from a coarse histogram
    // still lands exactly (the algorithm's invariant, not an estimate)
    val rows = (1 to 10000).map(i => ("k", (i % 100).toDouble))
    val got = Scale.kthSmallestByKey(rows.toDF("key", "v"), "v", "key", 0.5, nBuckets = 4)
      .collect().head.getDouble(3)
    assert(got == naiveKth(rows, 0.5)("k"))
  }
}
