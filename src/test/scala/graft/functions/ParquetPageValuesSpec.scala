package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[ParquetPageValues]] battery: Spark's OWN writer (parquet-mr)
  * across all four decodable page codecs, dictionary and PLAIN
  * encodings, optional columns with real null slots, value capping,
  * refusal surface. Cross-writer coverage (pyarrow) rides on the
  * q338 oracle fixture. */
class ParquetPageValuesSpec extends SparkSpec {
  import spark.implicits._

  private def onePartBytes(write: String => Unit): Array[Byte] = {
    val dir = Files.createTempDirectory("graft-ppv").toFile
    write(dir.toString)
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.readAllBytes(part.toPath)
  }

  private def values(r: org.apache.spark.sql.catalyst.InternalRow): Seq[String] = {
    val a = r.getArray(5)
    (0 until a.numElements()).map(i =>
      if (a.isNullAt(i)) null else a.getUTF8String(i).toString)
  }

  test("all four page codecs round-trip Spark's own writer: " +
    "dictionary string column with nulls, plain-decoded long column") {
    for (codec <- Seq("uncompressed", "snappy", "gzip", "zstd")) {
      val bytes = onePartBytes { dir =>
        spark.range(0, 50).selectExpr(
            "id",
            "CASE WHEN id % 7 = 3 THEN NULL ELSE concat('v', id % 5) END" +
              " AS name")
          .coalesce(1).write.mode("overwrite")
          .option("compression", codec).parquet(dir)
      }
      val idR = ParquetPageValues.compute(bytes, "id", 1 << 16)
      assert(idR != null, s"$codec id")
      assert(idR.getUTF8String(0).toString == "int64")
      assert(idR.getLong(4) == 50L)
      assert(values(idR) == (0 until 50).map(_.toString), codec)
      val nameR = ParquetPageValues.compute(bytes, "name", 1 << 16)
      assert(nameR != null, s"$codec name")
      val want = (0 until 50).map(i =>
        if (i % 7 == 3) null else s"v${i % 5}")
      assert(values(nameR) == want, codec)
      assert(nameR.getUTF8String(2).toString.contains("dictionary"), codec)
    }
  }

  test("dictionary disabled -> PLAIN pages; booleans and doubles " +
    "decode; maxVals caps materialization but num_values stays exact") {
    val bytes = onePartBytes { dir =>
      spark.range(0, 40).selectExpr(
          "cast(id as int) as i32",
          "id % 2 = 0 as flag",
          "cast(id as double) / 4 as score",
          "cast(id as float) as f",
          "concat('s', id) as s")
        .coalesce(1).write.mode("overwrite")
        .option("parquet.enable.dictionary", "false")
        .option("compression", "snappy").parquet(dir)
    }
    val i32 = ParquetPageValues.compute(bytes, "i32", 1 << 16)
    assert(i32.getUTF8String(0).toString == "int32")
    assert(i32.getUTF8String(2).toString == "plain")
    assert(values(i32) == (0 until 40).map(_.toString))
    val flag = ParquetPageValues.compute(bytes, "flag", 1 << 16)
    assert(values(flag) == (0 until 40).map(i =>
      if (i % 2 == 0) "true" else "false"))
    val score = ParquetPageValues.compute(bytes, "score", 1 << 16)
    assert(values(score) == (0 until 40).map(i => (i / 4.0).toString))
    val f = ParquetPageValues.compute(bytes, "f", 1 << 16)
    assert(values(f) == (0 until 40).map(i => i.toFloat.toString))
    val s = ParquetPageValues.compute(bytes, "s", 1 << 16)
    assert(values(s) == (0 until 40).map(i => s"s$i"))
    val capped = ParquetPageValues.compute(bytes, "s", 7)
    assert(values(capped).length == 7 && capped.getLong(4) == 40L)
  }

  test("fail-closed: absent column, nested leaf, repeated column, " +
    "bad magic, truncated page region, junk") {
    val bytes = onePartBytes { dir =>
      spark.range(0, 10).selectExpr(
          "id",
          "named_struct('inner', cast(id as string)) as nest",
          "array(id, id + 1) as arr")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    assert(ParquetPageValues.compute(bytes, "nope", 16) == null)
    // 'inner' is a leaf but NOT top-level; 'nest'/'arr' are not leaves
    assert(ParquetPageValues.compute(bytes, "inner", 16) == null)
    assert(ParquetPageValues.compute(bytes, "nest", 16) == null)
    assert(ParquetPageValues.compute(bytes, "arr", 16) == null)
    assert(values(ParquetPageValues.compute(bytes, "id", 16)) ==
      (0 until 10).map(_.toString))
    val bad = bytes.clone(); bad(0) = 'X'
    assert(ParquetPageValues.compute(bad, "id", 16) == null)
    // zero out the page region (keeps footer intact): header parse dies
    val hole = bytes.clone()
    java.util.Arrays.fill(hole, 4, 40, 0.toByte)
    assert(ParquetPageValues.compute(hole, "id", 16) == null)
    assert(ParquetPageValues.compute("junk".getBytes, "id", 16) == null)
  }

  test("Column API + SQL registration dispatch") {
    val bytes = onePartBytes { dir =>
      spark.range(0, 5).coalesce(1).write.mode("overwrite").parquet(dir)
    }
    val df = Seq((1L, bytes)).toDF("doc_id", "payload")
      .select(graft.ext.Multimodal.parquetPageValues(col("payload"), "id")
        .as("pv"))
      .select(col("pv.ptype"), col("pv.values"))
    val row = df.collect()(0)
    assert(row.getString(0) == "int64")
    assert(row.getSeq[String](1) == (0 until 5).map(_.toString))
  }
}
