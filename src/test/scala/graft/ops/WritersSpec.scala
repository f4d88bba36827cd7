package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Upsert/delete writer invariants (FIXTURES.md §C). */
class WritersSpec extends SparkSpec {
  import spark.implicits._

  def base = (1L to 100L).map(i => (i, s"a$i", i.toDouble)).toDF("pk", "a", "b")
  def delta = (51L to 150L).map(i => (i, s"new$i", i * 2.0)).toDF("pk", "a", "b")

  test("upsert = latest-wins merge: 150 rows, overlap updated, new inserted") {
    val merged = Writers.upsert(base, delta, "pk").cache()
    assert(merged.count() == 150)
    assert(merged.filter($"pk" === 60L && $"a" === "new60").count() == 1)
    assert(merged.filter($"pk" === 10L && $"a" === "a10").count() == 1)
    assert(merged.filter($"pk" === 150L && $"a" === "new150").count() == 1)
    assert(merged.select("pk").distinct().count() == 150)
  }

  test("duplicate pk within delta is pre-deduplicated (0/1-row invariant)") {
    val dupDelta = delta.union(Seq((60L, "zzz60", 0.0)).toDF("pk", "a", "b"))
    val merged = Writers.upsert(base, dupDelta, "pk", orderBy = Seq($"a".desc))
    assert(merged.filter($"pk" === 60L).count() == 1)
    // "zzz60" > "new60" in the explicit order → latest wins
    assert(merged.filter($"pk" === 60L).select("a").as[String].head() == "zzz60")
  }

  test("assertUniquePk errors on duplicate keys (CopyUtils.java:763-767)") {
    Writers.assertUniquePk(base, "pk") // fine
    val dup = base.union(Seq((1L, "x", 0.0)).toDF("pk", "a", "b"))
    val e = intercept[RuntimeException](Writers.assertUniquePk(dup, "pk"))
    assert(e.getMessage.contains("primary key"))
  }

  test("deleteByPk: keys 1..25 leave 75 rows") {
    val keys = (1L to 25L).toDF("k")
    val left = Writers.deleteByPk(base, keys, "pk")
    assert(left.count() == 75)
    assert(left.agg(min($"pk")).as[Long].head() == 26L)
  }
}
