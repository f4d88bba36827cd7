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

  private def resourceBytes(name: String): Array[Byte] = {
    val hex = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(getClass.getResource("/" + name).toURI)),
      "US-ASCII").trim
    hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  test("parquet-mr v2 writer: DELTA_BINARY_PACKED int64/int32 across " +
    "multiple blocks with negatives, DELTA_BYTE_ARRAY strings with " +
    "nulls — Spark's own output decodes exactly") {
    def v(i: Int): Long =
      if (i % 37 == 5) -1000000L - i else ((i * 7919L) % 4096) - 2048
    val bytes = onePartBytes { dir =>
      spark.range(0, 500).selectExpr(
          "id",
          "cast(id * id - 250 * id as long) as quad",
          "cast(id % 100 - 50 as int) as i32",
          "CASE WHEN id % 11 = 4 THEN NULL ELSE " +
            "concat('prefix-', id % 3, '-', id) END AS name")
        .coalesce(1).write.mode("overwrite")
        .option("parquet.writer.version", "v2")
        .option("parquet.enable.dictionary", "false")
        .option("compression", "snappy").parquet(dir)
    }
    val idR = ParquetPageValues.compute(bytes, "id", 1 << 16)
    assert(idR != null && idR.getUTF8String(2).toString ==
      "delta_binary_packed")
    assert(values(idR) == (0 until 500).map(_.toString))
    val quad = ParquetPageValues.compute(bytes, "quad", 1 << 16)
    assert(values(quad) == (0 until 500).map(i =>
      (i.toLong * i - 250L * i).toString))
    val i32 = ParquetPageValues.compute(bytes, "i32", 1 << 16)
    assert(i32.getUTF8String(0).toString == "int32")
    assert(values(i32) == (0 until 500).map(i => (i % 100 - 50).toString))
    val nameR = ParquetPageValues.compute(bytes, "name", 1 << 16)
    assert(nameR != null && nameR.getUTF8String(2).toString ==
      "delta_byte_array")
    assert(values(nameR) == (0 until 500).map(i =>
      if (i % 11 == 4) null else s"prefix-${i % 3}-$i"))
    assert(v(5) == -1000005L) // keep the helper honest
  }

  test("pinned pyarrow v2-encoding files (BYTE_STREAM_SPLIT + the " +
    "delta family) decode in BOTH data-page forms") {
    val ids = Seq("100", "99", "97", "1000000", "-5", "0", "7")
    val names = Seq("alpha", "alphabet", "alps", "beta", null,
      "betamax", "alpha")
    val tags = Seq("x", "", "yy", "zzz", "yy", "x", "qqqq")
    val scores = Seq("0.5", "-1.25", "3.0", "1.0E10", "-0.0", "2.5",
      "0.125")
    val floats = Seq("1.5", "-2.25", "0.0", "3.5", "-0.5", "10.0", "0.25")
    for (res <- Seq("parquet_v2dp.hex", "parquet_v1dp.hex")) {
      val bytes = resourceBytes(res)
      val idR = ParquetPageValues.compute(bytes, "id", 1 << 16)
      assert(idR != null, res)
      assert(idR.getUTF8String(2).toString == "delta_binary_packed")
      assert(values(idR) == ids, res)
      val nameR = ParquetPageValues.compute(bytes, "name", 1 << 16)
      assert(nameR.getUTF8String(2).toString == "delta_byte_array")
      assert(values(nameR) == names, res)
      val tagR = ParquetPageValues.compute(bytes, "tag", 1 << 16)
      assert(tagR.getUTF8String(2).toString == "delta_length_byte_array")
      assert(values(tagR) == tags, res)
      val scoreR = ParquetPageValues.compute(bytes, "score", 1 << 16)
      assert(scoreR.getUTF8String(2).toString == "byte_stream_split")
      assert(values(scoreR) == scores, res)
      val fR = ParquetPageValues.compute(bytes, "f", 1 << 16)
      assert(fR.getUTF8String(2).toString == "byte_stream_split")
      assert(values(fR) == floats, res)
    }
  }

  test("v2-encoding malformed shapes fail closed: truncated delta " +
    "region, BSS length lie") {
    val bytes = resourceBytes("parquet_v2dp.hex")
    // flip every byte of the page region one at a time is overkill;
    // cut the file mid-pages instead (footer gone -> null), and lie
    // about the head magic
    assert(ParquetPageValues.compute(bytes.take(600), "id", 16) == null)
    val bad = bytes.clone(); bad(0) = 'X'
    assert(ParquetPageValues.compute(bad, "id", 16) == null)
    // corrupt one byte INSIDE the first page header region: decode
    // must return null or still satisfy its own contract, never throw
    for (off <- 4 until 80) {
      val c = bytes.clone()
      c(off) = (c(off) ^ 0x5a).toByte
      val r = ParquetPageValues.compute(c, "id", 16)
      if (r != null) {
        assert(r.getLong(4) >= 0L)
      }
    }
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
