package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.QpDecode

/** The email/mbox tier: RFC 4155 record split with mboxrd unquoting,
  * RFC 5322 headers with unfolding, RFC 2047 encoded-words, RFC 2045
  * transfer decodings (base64 + quoted-printable), multipart walks,
  * and the stripQuotedReply composition. */
class MimeSpec extends SparkSpec {
  import spark.implicits._

  test("qp_decode kernel: hex escapes (both cases), soft breaks " +
    "(CRLF/LF/CR), malformed escapes stay literal, trailing '='") {
    def qp(s: String): String =
      new String(QpDecode.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)), "UTF-8")
    assert(qp("a=3Db") == "a=b")
    assert(qp("caf=C3=A9") == "café")
    assert(qp("lower=c3=a9") == "loweré")
    assert(qp("soft=\r\nbreak") == "softbreak")
    assert(qp("soft=\nbreak") == "softbreak")
    assert(qp("bad=ZZkept") == "bad=ZZkept")
    assert(qp("end=") == "end=")
    assert(qp("under_score") == "under_score") // body QP keeps '_'
  }

  private val mbox =
    "junk preamble that is not a message\n" +
    "From alice@example.com Thu Jan  1 00:00:00 2026\n" +
    "Subject: Re: the\n topic\n" + // folded header
    "From: Alice <alice@x.io>\n" +
    "Date: Thu, 01 Jan 2026 00:00:00 +0000\n" +
    "Content-Type: multipart/alternative; boundary=\"bnd.42\"\n" +
    "\n" +
    "preamble text\n" +
    "--bnd.42\n" +
    "Content-Type: text/plain; charset=utf-8\n" +
    "Content-Transfer-Encoding: quoted-printable\n" +
    "\n" +
    "Hello =C3=A9 world\n" +
    "> quoted reply line\n" +
    ">From the body, mboxrd-quoted\n" +
    "bye\n" +
    "--bnd.42\n" +
    "Content-Type: text/html\n" +
    "\n" +
    "<p>html alternative</p>\n" +
    "--bnd.42--\n" +
    "From bob@example.com Thu Jan  2 00:00:00 2026\n" +
    "Subject: =?UTF-8?B?QsO8IHN1YmplY3Q=?= and =?ISO-8859-1?Q?caf=E9?=\n" +
    "From: Bob <bob@y.io>\n" +
    "Content-Type: text/plain\n" +
    "Content-Transfer-Encoding: base64\n" +
    "\n" +
    java.util.Base64.getEncoder.encodeToString(
      "plain base64 body".getBytes("UTF-8")) + "\n"

  test("mboxMessages: records split on envelope lines, preamble junk " +
    "dropped, mboxrd '>From ' unquoted, envelopes kept") {
    val df = Seq((1L, mbox)).toDF("doc_id", "text")
    val msgs = TextAnalysis.mboxMessages(df).orderBy("msg_idx").collect()
    assert(msgs.length == 2)
    assert(msgs(0).getString(2).startsWith("alice@example.com"))
    assert(msgs(1).getString(2).startsWith("bob@example.com"))
    val raw0 = msgs(0).getString(3)
    assert(raw0.startsWith("Subject:"), "envelope line removed")
    assert(raw0.contains("\nFrom the body, mboxrd-quoted\n"),
      "one '>' stripped")
    assert(!raw0.contains(">From the body"))
  }

  test("emailParse: unfolded headers, RFC 2047 subjects (B/UTF-8 and " +
    "Q/latin1), content-type split into mime/charset/boundary, " +
    "absent headers null") {
    val df = Seq((1L, mbox)).toDF("doc_id", "text")
    val parsed = TextAnalysis.emailParse(
      TextAnalysis.mboxMessages(df), carryCols = Seq("msg_idx"))
      .orderBy("msg_idx").collect()
    val m0 = parsed(0)
    assert(m0.getString(2) == "Re: the topic", "folded header unfolded")
    assert(m0.getString(3) == "Alice <alice@x.io>")
    assert(m0.getString(5) == "Thu, 01 Jan 2026 00:00:00 +0000")
    assert(m0.getString(7) == "multipart/alternative")
    assert(m0.getString(9) == "bnd.42", "quoted boundary")
    val m1 = parsed(1)
    assert(m1.getString(2) == "Bü subject and café",
      "B/UTF-8 and Q/latin1 encoded-words decode")
    assert(m1.getString(7) == "text/plain")
    assert(m1.getString(10) == "base64")
    assert(m1.isNullAt(9), "no boundary on a single-part message")
    assert(m1.isNullAt(6), "absent Message-ID stays null")
  }

  test("emailText: multipart prefers text/plain (decoded QP), base64 " +
    "single-part decodes, text/html goes through htmlToText, " +
    "malformed base64 fails the text closed") {
    val df = Seq((1L, mbox)).toDF("doc_id", "text")
    val texts = TextAnalysis.emailText(TextAnalysis.emailParse(
        TextAnalysis.mboxMessages(df), carryCols = Seq("msg_idx")))
      .orderBy("msg_idx").select("text").collect()
    assert(texts(0).getString(0) ==
      "Hello é world\n> quoted reply line\nFrom the body, " +
        "mboxrd-quoted\nbye")
    assert(texts(1).getString(0) == "plain base64 body")
    // html-only multipart goes through htmlToText
    val htmlOnly = "From x@y Thu Jan  1 00:00:00 2026\n" +
      "Content-Type: multipart/mixed; boundary=zz\n\n" +
      "--zz\nContent-Type: text/html\n\n<p>only <b>html</b></p>\n--zz--\n"
    val h = TextAnalysis.emailText(TextAnalysis.emailParse(
      TextAnalysis.mboxMessages(Seq((1L, htmlOnly)).toDF("doc_id", "text"))))
      .select("text").collect()(0).getString(0)
    assert(h == "only html")
    // malformed base64: the text fails closed to null
    val badB64 = "From x@y Thu Jan  1 00:00:00 2026\n" +
      "Content-Type: text/plain\nContent-Transfer-Encoding: base64\n\n" +
      "@@not base64 at all!\n"
    val b = TextAnalysis.emailText(TextAnalysis.emailParse(
      TextAnalysis.mboxMessages(Seq((1L, badB64)).toDF("doc_id", "text"))))
      .select("text").collect()(0)
    assert(b.isNullAt(0))
    // latin1 charset honored on a QP body
    val latin = "From x@y Thu Jan  1 00:00:00 2026\n" +
      "Content-Type: text/plain; charset=iso-8859-1\n" +
      "Content-Transfer-Encoding: quoted-printable\n\ncaf=E9\n"
    val l = TextAnalysis.emailText(TextAnalysis.emailParse(
      TextAnalysis.mboxMessages(Seq((1L, latin)).toDF("doc_id", "text"))))
      .select("text").collect()(0).getString(0)
    assert(l == "café\n", "single-part bodies keep their trailing newline")
  }

  test("mboxToCorpus composes into stripQuotedReply: quoted lines " +
    "dropped, subject/sender/date carried per message") {
    val df = Seq((1L, mbox)).toDF("doc_id", "text")
    val rows = TextAnalysis.mboxToCorpus(df).orderBy("msg_idx").collect()
    assert(rows.length == 2)
    val r0 = rows(0)
    assert(r0.getString(2) == "Re: the topic")
    assert(r0.getString(3) == "Alice <alice@x.io>")
    assert(r0.getString(5) ==
      "Hello é world\nFrom the body, mboxrd-quoted\nbye")
    assert(r0.getLong(6) == 4L && r0.getLong(7) == 1L)
    val r1 = rows(1)
    assert(r1.getString(5) == "plain base64 body")
    assert(r1.getLong(7) == 0L)
  }
}
