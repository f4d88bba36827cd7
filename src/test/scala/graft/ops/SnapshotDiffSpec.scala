package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private def snap(rows: (Long, String, String)*) =
    rows.toDF("id", "text", "meta")

  test("diff classifies added/removed/changed and drops unchanged rows") {
    val prev = snap((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "x"))
    val next = snap((1L, "a", "x"), (2L, "B", "x"), (4L, "d", "x"))
    val out = SnapshotDiff.diff(prev, next, "id", Seq("text", "meta"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("contentHash separates column boundaries (no ab|c vs a|bc collision)") {
    val a = snap((1L, "ab", "c"))
    val b = snap((1L, "a", "bc"))
    val out = SnapshotDiff.diff(a, b, "id", Seq("text", "meta"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "changed"))
  }

  test("identical snapshots produce an empty diff") {
    val prev = snap((1L, "a", "x"), (2L, "b", "y"))
    assert(SnapshotDiff.diff(prev, prev, "id", Seq("text", "meta")).isEmpty)
  }
}
