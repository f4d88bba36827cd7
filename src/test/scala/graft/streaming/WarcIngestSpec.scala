package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ext.TextAnalysis

/** Streaming `.warc.gz` ingest: the stream-accumulated corpus must
  * equal the batch pipeline over the same archives, corrupt archives
  * must vanish whole, and the 404 gate must hold in-stream. */
class WarcIngestSpec extends SparkSpec {
  import spark.implicits._

  private def gz(s: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(s.getBytes("UTF-8")); g.close()
    bos.toByteArray
  }

  private def rec(id: Long, r: Int, status: String, body: String): String =
    s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: https://x.io/p${id}r$r\r\n\r\n" +
      s"HTTP/1.1 $status\r\nContent-Type: text/html\r\n\r\n$body"

  test("stream-ingested records ≡ batch pipeline; 404s gated; corrupt archives vanish") {
    val archives = Seq(
      (1L, gz(rec(1, 0, "200 OK", "<p>alpha one</p>")) ++
        gz(rec(1, 1, "404 Not Found", "<p>gone</p>")) ++
        gz(rec(1, 2, "200 OK", "<p>beta</p>"))),
      (2L, gz(rec(2, 0, "200 OK", "<b>gamma</b>"))),
      (3L, "not gzip at all".getBytes))
    val df = archives.toDF("doc_id", "warc_gz")
    val root = Files.createTempDirectory("graft-warc-ingest").toString
    val (landing, corpus, ckpt) =
      (s"$root/landing", s"$root/corpus", s"$root/ckpt")
    df.repartition(2).write.parquet(landing)

    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("warc_gz", BinaryType)))
    val q = CurationStream.warcGzIngestStream(
      spark.readStream.schema(schema).parquet(landing), corpus, ckpt)
    assert(q.awaitTermination(180000), "stream did not drain in time")

    val got = spark.read.parquet(corpus)
      .select("doc_id", "rec_idx", "url", "text")
      .collect().map(_.toSeq).toSet
    val want = TextAnalysis.warcParseGzFile(df)
      .filter(col("http_status") === 200)
      .select(col("doc_id"), col("rec_idx"),
        col("target_uri").as("url"),
        TextAnalysis.htmlToText(col("body")).as("text"))
      .collect().map(_.toSeq).toSet
    assert(got == want, "stream must equal the batch pipeline")
    assert(got.map(r => (r(0), r(1))) ==
      Set((1L, 0L), (1L, 2L), (2L, 0L)), "404 gated, corrupt gone")
    assert(got.exists(_(3) == "alpha one"))
  }

  test("warcParseGzFile exposes the aggregate inflate cap (maxTotalOut): " +
    "an archive past the cap vanishes whole; the 8 GiB default admits " +
    "multi-member archives the kernel's generic 256 MiB would refuse") {
    val big = rec(9, 0, "200 OK", "<p>" + "w" * 5000 + "</p>")
    val df = Seq((9L, gz(big) ++ gz(big))).toDF("doc_id", "warc_gz")
    assert(TextAnalysis.warcParseGzFile(df).count() == 2)
    // cap below one member's inflated size: whole archive fails closed
    assert(TextAnalysis.warcParseGzFile(df, maxTotalOut = 4096).count() == 0)
    // cap admitting one member but not both: still whole-archive null
    // (fail closed, never silent partial rows)
    assert(TextAnalysis.warcParseGzFile(df, maxTotalOut = 6000).count() == 0)
  }
}
