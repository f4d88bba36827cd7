package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ParquetFooterSpec extends SparkSpec {
  import spark.implicits._

  private def onePartBytes(write: String => Unit): Array[Byte] = {
    val dir = Files.createTempDirectory("graft-pq").toFile
    write(dir.toString)
    val part = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
    Files.readAllBytes(part.toPath)
  }

  test("parquet_meta reads Spark's OWN parquet output: exact rows, row " +
    "groups, writer string, nested schema leaves with repetition") {
    val bytes = onePartBytes { dir =>
      spark.range(0, 1000).selectExpr(
          "id",
          "cast(id as double) as x",
          "named_struct('s', cast(id as string), 'i', cast(id as int)) " +
            "as nested",
          "cast(null as string) as opt")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    val r = ParquetFooterMeta.compute(bytes, 4096)
    assert(r != null)
    assert(r.getLong(1) == 1000L, "num_rows is exact")
    assert(r.getInt(2) >= 1, "at least one row group")
    assert(r.getUTF8String(3).toString.toLowerCase.contains("parquet"))
    val cols = r.getArray(4)
    val got = (0 until cols.numElements()).map { i =>
      val c = cols.getStruct(i, 3)
      (c.getUTF8String(0).toString, c.getUTF8String(1).toString,
        c.getUTF8String(2).toString)
    }
    assert(got.map(c => c._1 -> c._2).toMap == Map(
      "id" -> "int64", "x" -> "double", "nested.s" -> "byte_array",
      "nested.i" -> "int32", "opt" -> "byte_array"))
    assert(got.find(_._1 == "id").get._3 == "required")
    assert(got.find(_._1 == "opt").get._3 == "optional")
    // leaf order follows the schema tree depth-first
    assert(got.map(_._1) ==
      Seq("id", "x", "nested.s", "nested.i", "opt"))
  }

  test("parquet_meta: multi-row-group files count their groups; the " +
    "Column API composes with sniffFormat") {
    val bytes = onePartBytes { dir =>
      spark.range(0, 50000)
        .selectExpr("id", "repeat(cast(id as string), 20) as pad")
        .coalesce(1)
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .parquet(dir)
    }
    val r = ParquetFooterMeta.compute(bytes, 4096)
    assert(r != null && r.getLong(1) == 50000L)
    assert(r.getInt(2) > 1, s"expected >1 row groups, got ${r.getInt(2)}")
    val df = Seq((1L, bytes)).toDF("doc_id", "payload")
      .select(col("doc_id"),
        graft.ext.Multimodal.sniffFormat(col("payload")).as("fmt"),
        graft.ext.Multimodal.parquetMeta(col("payload"))
          .getField("num_rows").as("n"))
      .collect()(0)
    assert(df.getString(1) == "parquet" && df.getLong(2) == 50000L)
  }

  test("parquet_meta fails closed: missing magic, doctored footer " +
    "length, truncation") {
    val ok = onePartBytes { dir =>
      spark.range(0, 10).coalesce(1).write.mode("overwrite").parquet(dir)
    }
    assert(ParquetFooterMeta.compute(ok, 4096) != null)
    val noTail = ok.clone(); noTail(ok.length - 1) = 'X'
    assert(ParquetFooterMeta.compute(noTail, 4096) == null)
    val noHead = ok.clone(); noHead(0) = 'X'
    assert(ParquetFooterMeta.compute(noHead, 4096) == null)
    // footer length pointing past the file start
    val badLen = ok.clone()
    badLen(ok.length - 8) = 0xff.toByte
    badLen(ok.length - 7) = 0xff.toByte
    badLen(ok.length - 6) = 0x7f.toByte
    assert(ParquetFooterMeta.compute(badLen, 4096) == null)
    assert(ParquetFooterMeta.compute(ok.take(20), 4096) == null)
    assert(ParquetFooterMeta.compute("PAR1junkPAR1".getBytes, 4096) == null)
  }

  test("parquet_column_stats reads Spark's OWN parquet-mr output: " +
    "per-chunk value counts and min/max/null_count decoded per type") {
    val bytes = onePartBytes { dir =>
      spark.range(0, 1000).selectExpr(
          "id",
          "case when id % 10 = 0 then null " +
            "else cast(id as string) end as s",
          "cast(id as double)/4 as d")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    val r = ParquetColumnStats.compute(bytes, 16384)
    assert(r != null && r.numElements() == 3, "3 chunks in 1 row group")
    val rows = (0 until r.numElements()).map { i =>
      val c = r.getStruct(i, 12)
      (c.getInt(0), c.getLong(1), c.getUTF8String(3).toString,
        c.getUTF8String(4).toString,
        if (c.isNullAt(9)) -1L else c.getLong(9),
        if (c.isNullAt(10)) null else c.getUTF8String(10).toString,
        if (c.isNullAt(11)) null else c.getUTF8String(11).toString)
    }
    assert(rows(0) == ((0, 1000L, "id", "int64", 0L, "0", "999")))
    // string min/max are lexicographic over the non-null values
    assert(rows(1) == ((0, 1000L, "s", "byte_array", 100L, "1", "999")))
    assert(rows(2) == ((0, 1000L, "d", "double", 0L, "0.0", "249.75")))
    // num_values counts ALL values of the chunk (nulls included)
    assert((0 until 3).forall(i => r.getStruct(i, 12).getLong(6) == 1000L))
  }

  test("parquet_column_stats reads the pinned pyarrow file (2 row " +
    "groups, snappy): every stat known by construction; fail-closed " +
    "shares parquet_meta's surface") {
    val in = getClass.getResourceAsStream("/parquet/stats.parquet")
    assert(in != null)
    val bytes = try in.readAllBytes() finally in.close()
    val r = ParquetColumnStats.compute(bytes, 16384)
    assert(r != null && r.numElements() == 6)
    val rows = (0 until 6).map { i =>
      val c = r.getStruct(i, 12)
      (c.getInt(0), c.getLong(1), c.getUTF8String(3).toString,
        c.getUTF8String(4).toString, c.getUTF8String(5).toString,
        c.getLong(6), c.getLong(9),
        c.getUTF8String(10).toString, c.getUTF8String(11).toString)
    }
    assert(rows(0) == ((0, 4L, "id", "int64", "snappy", 4L, 0L, "1", "4")))
    assert(rows(1) ==
      ((0, 4L, "name", "byte_array", "snappy", 4L, 1L, "alpha", "delta")))
    assert(rows(2) ==
      ((0, 4L, "score", "double", "snappy", 4L, 1L, "-2.25", "3.75")))
    assert(rows(3) == ((1, 3L, "id", "int64", "snappy", 3L, 1L, "6", "7")))
    assert(rows(4) ==
      ((1, 3L, "name", "byte_array", "snappy", 3L, 0L, "eps", "zeta")))
    assert(rows(5) ==
      ((1, 3L, "score", "double", "snappy", 3L, 0L, "-1.0", "9.0")))
    // rg byte sizes as pyarrow reports them
    assert(r.getStruct(0, 12).getLong(2) == 311L)
    assert(r.getStruct(3, 12).getLong(2) == 287L)
    // fail-closed: doctored tail / truncation / junk
    val noTail = bytes.clone(); noTail(bytes.length - 1) = 'X'
    assert(ParquetColumnStats.compute(noTail, 16384) == null)
    assert(ParquetColumnStats.compute(bytes.take(30), 16384) == null)
    assert(ParquetColumnStats.compute("PAR1junkPAR1".getBytes, 16384) == null)
    // chunk bound: 6 chunks under a bound of 4 must refuse, not clip
    assert(ParquetColumnStats.compute(bytes, 4) == null)
  }

  test("parquet_meta reads pyarrow (parquet-cpp) output pinned as " +
    "constants: cross-writer coverage") {
      val pqA =
        "5041523115041570154C4C150E15001200003800000D0100010D0800020D" +
        "0800030D0800040D083C0500000000000000060000000000000015001516" +
        "151A2C150E1510150615061C180806000000000000001808000000000000" +
        "0000160028080600000000000000180800000000000000000000000B2802" +
        "0000000E01030388C61A2684021C1504193500061019180269641502160E" +
        "169C0216FC01267026081C18080600000000000000180800000000000000" +
        "001600280806000000000000001808000000000000000000192C15041500" +
        "1502001500151015020000001504155415484C150E15001200002A140200" +
        "00006E3005060031050600320506003305063034020000006E3502000000" +
        "6E3615001516151A2C150E1510150615061C360028026E3618026E300000" +
        "000B28020000000E01030388C61A26F4041C150C19350006101918046E61" +
        "6D651502160E16C00116B80126A00426BC031C360028026E3618026E3000" +
        "192C150415001502001500151015020000001504193C3500180673636865" +
        "6D61150400150425021802696400150C250218046E616D6525004C1C0000" +
        "00160E191C192C2684021C1504193500061019180269641502160E169C02" +
        "16FC01267026081C18080600000000000000180800000000000000001600" +
        "280806000000000000001808000000000000000000192C15041500150200" +
        "15001510150200000026F4041C150C19350006101918046E616D65150216" +
        "0E16C00116B80126A00426BC031C360028026E3618026E3000192C150415" +
        "0015020015001510150200000016DC03160E260816B403140000191C180C" +
        "4152524F573A736368656D6118EC012F2F2F2F2F36674141414151414141" +
        "414141414B41417741426741464141674143674141414141424241414D41" +
        "414141434141494141414142414149414141414241414141414941414142" +
        "454141414142414141414E542F2F2F384141414546454141414142774141" +
        "414145414141414141414141415141414142755957316C41414141414151" +
        "414241414541414141454141554141674142674148414177414141415141" +
        "424141414141414141454345414141414277414141414541414141414141" +
        "4141414941414142705A4141414341414D41416741427741494141414141" +
        "414141415541414141413D001820706172717565742D6370702D6172726F" +
        "772076657273696F6E2031362E312E30192C1C00001C0000000502000050" +
        "415231"
      val pqB =
        "504152311504151015144C15041500120000081C01000000020000001500" +
        "151215162C15041510150615061C18040200000018040100000016002804" +
        "02000000180401000000000000092002000000040101030226A8011C1502" +
        "19350006101918016B1502160416980116A001263826081C180402000000" +
        "180401000000160028040200000018040100000000192C15041500150200" +
        "1500151015020000001504150C15104C1502150012000006140200000065" +
        "6E1500151215162C15041510150615061C36002802656E1802656E000000" +
        "092002000000040201040026BA031C150C19350006101928046D65746104" +
        "6C616E67150216041674167C26EA0226BE021C36002802656E1802656E00" +
        "192C150415001502001500151015020000001504151015144C1502150012" +
        "0000081C000000000000F83F1500151215162C15041510150615061C1808" +
        "000000000000F83F1808000000000000F83F16002808000000000000F83F" +
        "1808000000000000F83F00000009200200000004020104002680061C150A" +
        "19350006101928046D6574610573636F72651502160416B80116C00126F0" +
        "0426C0041C1808000000000000F83F1808000000000000F83F1600280800" +
        "0000000000F83F1808000000000000F83F00192C15041500150200150015" +
        "1015020000001504150A150E4C1502150012000005100100000078150015" +
        "1215162C15041510150615061C3602280178180178000000092002000000" +
        "030201020026C2081C150C19350006101918036F707415021604166E1676" +
        "26F60726CC071C360228017818017800192C150415001502001500151015" +
        "0200000015041508150C4C15021500120000040C03000000150015121516" +
        "2C15021510150615061C1804030000001804030000001600280403000000" +
        "180403000000000000092002000000020101020026D00A1C150219350006" +
        "101918016B1502160216900116980126E00926B8091C1804030000001804" +
        "03000000160028040300000018040300000000192C150415001502001500" +
        "151015020000001504150C15104C15021500120000061402000000656E15" +
        "00151215162C15021510150615061C36002802656E1802656E0000000920" +
        "02000000020201020026E60C1C150C19350006101928046D657461046C61" +
        "6E67150216021674167C26960C26EA0B1C36002802656E1802656E00192C" +
        "150415001502001500151015020000001504151015144C15021500120000" +
        "081C000000000000F83F1500151215162C15021510150615061C18080000" +
        "00000000F83F1808000000000000F83F16002808000000000000F83F1808" +
        "000000000000F83F000000092002000000020201020026AC0F1C150A1935" +
        "0006101928046D6574610573636F72651502160216B80116C001269C0E26" +
        "EC0D1C1808000000000000F83F1808000000000000F83F16002808000000" +
        "000000F83F1808000000000000F83F00192C150415001502001500151015" +
        "020000001504150015024C15001500120000001500150E15122C15021510" +
        "150615061C360200000007180200000002000026D2111C150C1935000610" +
        "1918036F7074150216021654165A26961126F8101C360200192C15041500" +
        "1502001500151015020000001504196C35001806736368656D6115060015" +
        "02250218016B00350218046D657461150400150C250218046C616E672500" +
        "4C1C000000150A2502180573636F726500150C250218036F707425004C1C" +
        "0000001606192C194C26A8011C150219350006101918016B150216041698" +
        "0116A001263826081C180402000000180401000000160028040200000018" +
        "040100000000192C1504150015020015001510150200000026BA031C150C" +
        "19350006101928046D657461046C616E67150216041674167C26EA0226BE" +
        "021C36002802656E1802656E00192C150415001502001500151015020000" +
        "002680061C150A19350006101928046D6574610573636F72651502160416" +
        "B80116C00126F00426C0041C1808000000000000F83F1808000000000000" +
        "F83F16002808000000000000F83F1808000000000000F83F00192C150415" +
        "0015020015001510150200000026C2081C150C19350006101918036F7074" +
        "15021604166E167626F60726CC071C360228017818017800192C15041500" +
        "15020015001510150200000016B2041604260816D204140000194C26D00A" +
        "1C150219350006101918016B1502160216900116980126E00926B8091C18" +
        "0403000000180403000000160028040300000018040300000000192C1504" +
        "150015020015001510150200000026E60C1C150C19350006101928046D65" +
        "7461046C616E67150216021674167C26960C26EA0B1C36002802656E1802" +
        "656E00192C1504150015020015001510150200000026AC0F1C150A193500" +
        "06101928046D6574610573636F72651502160216B80116C001269C0E26EC" +
        "0D1C1808000000000000F83F1808000000000000F83F1600280800000000" +
        "0000F83F1808000000000000F83F00192C15041500150200150015101502" +
        "00000026D2111C150C19350006101918036F7074150216021654165A2696" +
        "1126F8101C360200192C1504150015020015001510150200000016900416" +
        "0226B80916AE04140200191C180C4152524F573A736368656D6118A0032F" +
        "2F2F2F2F7A414241414151414141414141414B4141774142674146414167" +
        "4143674141414141424241414D4141414143414149414141414241414941" +
        "4141414241414141414D414141444D414141414C41414141415141414142" +
        "512F2F2F2F41414142425241414141415541414141424141414141414141" +
        "414144414141416233423041486A2F2F2F39302F2F2F2F41414142445267" +
        "414141416741414141424141414141494141414249414141414641414141" +
        "415141414142745A58526841414141414B6A2F2F2F2B6B2F2F2F2F414141" +
        "424178414141414163414141414241414141414141414141464141414163" +
        "324E76636D554142674149414159414267414141414141416744552F2F2F" +
        "2F4141414242524141414141634141414142414141414141414141414541" +
        "414141624746755A77414141414145414151414241414141424141464141" +
        "49414159414277414D414141414541415141414141414141424168414141" +
        "414163414141414241414141414141414141424141414161774141414167" +
        "414441414941416341434141414141414141414567414141410018207061" +
        "72717565742D6370702D6172726F772076657273696F6E2031362E312E30" +
        "194C1C00001C00001C00001C000000B304000050415231"
    def un(h: String) = h.grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray
    val ra = ParquetFooterMeta.compute(un(pqA), 4096)
    assert(ra != null && ra.getLong(1) == 7L && ra.getInt(2) == 1)
    assert(ra.getUTF8String(3).toString.contains("parquet-cpp-arrow"))
    val ca = ra.getArray(4)
    assert((0 until ca.numElements()).map { i =>
      val c = ca.getStruct(i, 3)
      (c.getUTF8String(0).toString, c.getUTF8String(1).toString)
    } == Seq("id" -> "int64", "name" -> "byte_array"))
    val rb = ParquetFooterMeta.compute(un(pqB), 4096)
    assert(rb != null && rb.getLong(1) == 3L && rb.getInt(2) == 2)
    val cb = rb.getArray(4)
    assert((0 until cb.numElements()).map { i =>
      val c = cb.getStruct(i, 3)
      (c.getUTF8String(0).toString, c.getUTF8String(1).toString,
        c.getUTF8String(2).toString)
    } == Seq(("k", "int32", "optional"),
      ("meta.lang", "byte_array", "optional"),
      ("meta.score", "double", "optional"),
      ("opt", "byte_array", "optional")))
    assert(ra.getInt(0) == 2 && rb.getInt(0) == 2)
  }
}
