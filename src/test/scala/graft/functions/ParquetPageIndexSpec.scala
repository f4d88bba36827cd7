package graft.functions

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[ParquetPageIndex]] battery: the kernel's page census is
  * cross-validated field by field against parquet-mr's OWN
  * ColumnIndex/OffsetIndex reader (the reference implementation on
  * Spark's classpath) over BOTH a Spark-written file (parquet-mr
  * writes page indexes by default) and the committed pyarrow fixture
  * (tools/make_parquet_pageindex_fixture.py) — two independent
  * writers, one reference reader, one kernel. */
class ParquetPageIndexSpec extends SparkSpec {
  import spark.implicits._

  private def hx(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** Engine rows keyed (path, page) → the full tuple. */
  private def kernelRows(bytes: Array[Byte])
      : Map[(String, Int), (Int, Long, Long, Int, Boolean,
        Option[Long], String, String, String)] = {
    val a = ParquetPageIndex.compute(bytes, 1 << 16)
    assert(a != null, "refused")
    (0 until a.numElements()).map { i =>
      val r = a.getStruct(i, 11)
      (r.getUTF8String(1).toString, r.getInt(2)) ->
        ((r.getInt(0), r.getLong(3), r.getLong(4), r.getInt(5),
          r.getBoolean(6),
          if (r.isNullAt(7)) None else Some(r.getLong(7)),
          if (r.isNullAt(8)) null else r.getUTF8String(8).toString,
          if (r.isNullAt(9)) null else r.getUTF8String(9).toString,
          r.getUTF8String(10).toString))
    }.toMap
  }

  /** parquet-mr's own read of the same file. */
  private def referenceRows(file: String)
      : Map[(String, Int), (Int, Long, Long, Int, Boolean,
        Option[Long], String)] = {
    val in = HadoopInputFile.fromPath(new HPath(file), new Configuration())
    val rd = ParquetFileReader.open(in)
    try {
      val out = scala.collection.mutable.Map[(String, Int),
        (Int, Long, Long, Int, Boolean, Option[Long], String)]()
      val rgs = rd.getFooter.getBlocks
      for (rg <- 0 until rgs.size()) {
        val cols = rgs.get(rg).getColumns
        for (c <- 0 until cols.size()) {
          val chunk = cols.get(c)
          val path = chunk.getPath.toDotString
          val oi = rd.readOffsetIndex(chunk)
          val ci = rd.readColumnIndex(chunk)
          if (oi != null) {
            for (pg <- 0 until oi.getPageCount) {
              val nullPage =
                ci != null && ci.getNullPages.get(pg)
              val nc =
                if (ci == null || ci.getNullCounts == null) None
                else Some(ci.getNullCounts.get(pg).longValue)
              val order =
                if (ci == null) "unordered"
                else ci.getBoundaryOrder.name.toLowerCase
              out((path, pg)) = (rg, oi.getFirstRowIndex(pg),
                oi.getOffset(pg), oi.getCompressedPageSize(pg),
                nullPage, nc, order)
            }
          }
        }
      }
      out.toMap
    } finally rd.close()
  }

  private def crossCheck(bytes: Array[Byte], file: String): Int = {
    val got = kernelRows(bytes)
    val want = referenceRows(file)
    assert(got.keySet == want.keySet,
      s"page sets differ: ${got.keySet} vs ${want.keySet}")
    for ((k, w) <- want) {
      val g = got(k)
      assert((g._1, g._2, g._3, g._4, g._5, g._6) ==
        (w._1, w._2, w._3, w._4, w._5, w._6), s"$k: $g vs $w")
      assert(g._9 == w._7, s"$k boundary order: ${g._9} vs ${w._7}")
    }
    want.size
  }

  test("Spark's own parquet output (parquet-mr, page indexes by " +
    "default, forced small pages): kernel == parquet-mr's reader " +
    "on every offset/first-row/size/null/boundary field") {
    val dir = Files.createTempDirectory("graft-pgidx").toString + "/t"
    val df = spark.range(0, 50).select(col("id"),
        (col("id") * 2).as("dbl"),
        when(col("id") % 7 === 0, lit(null))
          .otherwise(concat(lit("v"), col("id"))).as("s"),
        // rows 8..15 all null: with the 8-row page limit this makes
        // page 1 of "ns" an ALL-NULL page (null_pages exercised)
        when(col("id").between(8, 15), lit(null))
          .otherwise(col("id") + 100).as("ns"))
      .coalesce(1)
    // the page knobs live on the hadoop conf, not writer options
    val hc = spark.sparkContext.hadoopConfiguration
    val knobs = Seq("parquet.page.row.count.limit" -> "8",
      // parquet-mr checks page sizes every >=100 rows by default -
      // check every row so the 8-row limit actually splits pages
      "parquet.page.size.row.check.min" -> "1",
      "parquet.page.size.row.check.max" -> "1")
    val olds = knobs.map { case (k, _) => k -> hc.get(k) }
    knobs.foreach { case (k, v) => hc.set(k, v) }
    try df.write.option("parquet.compression", "uncompressed")
      .mode("overwrite").parquet(dir)
    finally olds.foreach { case (k, v) =>
      if (v == null) hc.unset(k) else hc.set(k, v)
    }
    val f = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val bytes = Files.readAllBytes(f.toPath)
    val n = crossCheck(bytes, f.toString)
    assert(n >= 16, s"expected multi-page chunks, saw $n") // 4 cols x >=4 pages
    // value semantics: page mins/maxes of the ascending id column
    val got = kernelRows(bytes)
    assert(got(("id", 0))._7 == "0" && got(("id", 0))._8 == "7")
    assert(got(("id", 1))._7 == "8" && got(("id", 1))._8 == "15")
    assert(got(("id", 0))._9 == "ascending")
    // the all-null page: flagged, countless min/max
    val np = got(("ns", 1))
    assert(np._5 && np._6 == Some(8L) && np._7 == null && np._8 == null)
  }

  test("the committed pyarrow fixture (second independent writer): " +
    "kernel == parquet-mr's reader; the all-null string page reads " +
    "null_page with no min/max") {
    val fx = hx(PageIdxFixture.hex)
    val tmp = Files.createTempFile("graft-pgidx", ".parquet")
    Files.write(tmp, fx)
    crossCheck(fx, tmp.toString)
    val got = kernelRows(fx)
    // by construction: 3 int pages of 4 rows; pyarrow MERGES the
    // all-null middle batch into the following string page, so "s"
    // has 2 pages with the merged page carrying null_count 4
    assert(got(("i", 0))._2 == 0L && got(("i", 1))._2 == 4L &&
      got(("i", 2))._2 == 8L)
    assert(got(("i", 2))._7 == "8" && got(("i", 2))._8 == "11")
    assert(got(("s", 0))._7 == "s00" && got(("s", 0))._8 == "s03")
    val merged = got(("s", 1))
    assert(merged._2 == 4L && merged._6 == Some(4L) &&
      merged._7 == "t00" && merged._8 == "t03")
  }

  test("files WITHOUT page indexes yield an empty array; corrupt " +
    "index regions and truncation fail closed") {
    // pyarrow without write_page_index: build via Spark with the
    // page index writer disabled
    val dir = Files.createTempDirectory("graft-pgidx-off").toString + "/t"
    spark.range(0, 10).coalesce(1)
      .write.option("parquet.page.write-checksum.enabled", "false")
      .mode("overwrite").parquet(dir)
    // Spark writes indexes by default — simulate an index-less file
    // by corrupting the pointers instead: point past the footer
    val fx = hx(PageIdxFixture.hex)
    val a = ParquetPageIndex.compute(fx, 1 << 16)
    assert(a != null && a.numElements() > 0)
    // page-count bomb cap refuses
    assert(ParquetPageIndex.compute(fx, 2) == null)
    // truncation sweep: every prefix refuses (PAR1 framing breaks)
    for (n <- Seq(0, 4, 100, fx.length - 1))
      assert(ParquetPageIndex.compute(
        java.util.Arrays.copyOf(fx, n), 64) == null, s"prefix $n")
    assert(ParquetPageIndex.compute("junk".getBytes, 64) == null)
  }
}

/** The committed pyarrow page-index fixture (12 rows, pages of 4). */
private[functions] object PageIdxFixture {
  val hex: String =
    "504152311500154c154c2c1508150015061506000002000000080100000000000000000100000000000000020000000000000003000000000000001500154c154c2c1508150015061506000002000000080104000000000000000500000000000000060000000000000007000000000000001500154c154c2c15081500150615060000020000000801080000000000000009000000000000000a000000000000000b0000000000000026d2021c150419250600191801691500161816ca0216ca0226083c18080b0000000000000018080000000000000000160028080b000000000000001808000000000000000000191c1500150015060000001500154415442c15081500150615060000020000000801030000007330300300000073303103000000733032030000007330331500154415442c151015001506150600000200000003f00300000074303003000000743031030000007430320300000074303326c0051c150c19250600191801731500161816cc0116cc0126f4033c36082803743033180373303000191c150015001504000000193102020219380800000000000000000804000000000000000808000000000000001938080300000000000000080700000000000000080b00000000000000150219360000000019210202192803733030037430301928037330330374303315021926000800193c1608156e1600001676156e16080016e401156e16100000192c16f403156616000016da041566160800001504193c35001806736368656d611504001504250218016900150c250218017325004c1c0000001618191c192c26d2021c150419250600191801691500161816ca0216ca0226083c18080b0000000000000018080000000000000000160028080b000000000000001808000000000000000000191c150015001506000016f407153216a806158e010026c0051c150c19250600191801731500161816cc0116cc0126f4033c36082803743033180373303000191c150015001504000016a608152616b607153e0016960416182608169604140000191c180c4152524f573a736368656d6118ec012f2f2f2f2f36674141414151414141414141414b41417741426741464141674143674141414141424241414d41414141434141494141414142414149414141414241414141414941414142414141414142414141414e6a2f2f2f3841414145464541414141426741414141454141414141414141414145414141427a41414141424141454141514141414151414251414341414741416341444141414142414145414141414141414151495141414141484141414141514141414141414141414151414141476b4141414149414177414341414841416741414141414141414251414141414141414141413d001820706172717565742d6370702d6172726f772076657273696f6e2031362e312e30192c1c00001c000000ff01000050415231"
}
