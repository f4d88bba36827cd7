package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Similarity

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot_product is bit-identical to the interpreted fold on real embeddings") {
    val emb = load("embeddings")
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va")).limit(50)
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb")).limit(50)
    val pairs = a.crossJoin(b)
    val diff = pairs.select(
      Similarity.dot(col("va"), col("vb")).as("fast"),
      Similarity.dotFold(col("va"), col("vb")).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0) // bit-identical, not approximately equal
  }

  test("null array yields null; mismatched lengths error") {
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f, 1.0f)))).toDF("a", "b")
    val r = df.select(Similarity.dot(col("a"), col("b")).as("d")).collect()
    assert(r(0).getDouble(0) == 11.0)
    assert(r(1).isNullAt(0))
    val bad = Seq((Array(1.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    intercept[Exception] {
      bad.select(Similarity.dot(col("a"), col("b"))).collect()
    }
  }

  test("double arrays and mixed float/double inputs work") {
    val df = Seq((Array(1.0, 2.0), Array(3.0f, 4.0f))).toDF("a", "b")
    val r = df.select(Similarity.dot(col("a"), col("b"))).collect()(0)
    assert(r.getDouble(0) == 11.0)
  }

  test("non-array input is rejected at analysis time") {
    val df = Seq((1, Array(1.0f))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(Similarity.dot(col("a"), col("b"))).collect()
    }
  }

  test("VectorMean aggregator computes per-label centroids (matches explicit mean)") {
    import org.apache.spark.sql.{functions => F}
    val emb = load("embeddings")
    val vm = (new VectorMean).toColumn
    val got = emb.select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(vm.name("centroid"))
      .collect().toMap
    // reference: mean of position 0 for one label, computed directly
    val label = got.keys.head
    val exp = emb.filter(col("label") === label)
      .select(F.expr("CAST(embedding[0] AS DOUBLE)").as[Double])
      .collect()
    assert(math.abs(got(label)(0) - exp.sum / exp.length) < 1e-9)
    assert(got(label).length == 64)
  }

  test("registered as a SQL function (GraftExtensions.register)") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect()(0)
    assert(r.getDouble(0) == 11.0)
  }

  test("simhash16 is SQL-callable and matches Dedup.simhash") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT simhash16(array('alpha', 'beta', 'gamma')) AS h")
      .collect()(0).getLong(0)
    import spark.implicits._
    val viaApi = graft.ext.Dedup.simhash(Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"))
      .select("simhash").as[Long].head()
    assert(viaSql == viaApi)
  }

  test("minhash_sig and repetition_stats are SQL-callable and match the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val d = Seq((1L, "alpha beta gamma alpha beta gamma alpha")).toDF("doc_id", "text")
    d.createOrReplaceTempView("mh_docs")
    val viaSql = spark.sql(
      "SELECT minhash_sig(filter(split(text, ' '), t -> t <> ''), 3, 6) AS sig FROM mh_docs")
      .select("sig").as[Seq[String]].head()
    val viaApi = graft.ext.Dedup.minhash(d, k = 6)
      .select(array((0 until 6).map(i => col(s"mh$i")): _*)).as[Seq[String]].head()
    assert(viaSql == viaApi)
    val rep = spark.sql(
      "SELECT repetition_stats(filter(split(text, ' '), t -> t <> ''), 3) AS s FROM mh_docs")
      .select("s.best", "s.n").as[(Long, Long)].head()
    // 7 tokens → 5 3-shingles; "alpha beta gamma" repeats
    assert(rep._2 == 5 && rep._1 == 2)
    // non-literal shingle width must be rejected loudly, not miscompiled
    val err = intercept[Exception] {
      spark.sql("SELECT repetition_stats(array('a'), CAST(doc_id AS INT)) FROM mh_docs")
        .collect()
    }
    assert(err.getMessage.contains("literal"))
  }

  test("simhash64, ws_tokens and shingle_set are SQL-callable and match the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val d = Seq((1L, "alpha  beta gamma alpha beta")).toDF("doc_id", "text")
    d.createOrReplaceTempView("ws_docs")
    val toks = spark.sql("SELECT ws_tokens(text) AS t FROM ws_docs")
      .select("t").as[Seq[String]].head()
    assert(toks == Seq("alpha", "beta", "gamma", "alpha", "beta"))
    val h64 = spark.sql("SELECT simhash64(ws_tokens(text)) AS h FROM ws_docs")
      .collect()(0).getLong(0)
    val api64 = graft.ext.Dedup.simhash64(d).select("simhash").as[Long].head()
    assert(h64 == api64)
    val sh = spark.sql("SELECT shingle_set(ws_tokens(text), 3) AS s FROM ws_docs")
      .select("s").as[Seq[String]].head()
    assert(sh == Seq("alpha beta gamma", "beta gamma alpha", "gamma alpha beta"))
    val keyed = spark.sql("SELECT shingle_set(ws_tokens(text), 3, 16) AS s FROM ws_docs")
      .select("s").as[Seq[String]].head()
    assert(keyed.forall(_.length == 16) && keyed.size == sh.size)
    // token_ngrams keeps duplicates and order (the occurrence stream)
    val ng = spark.sql("SELECT token_ngrams(ws_tokens(text), 2) AS s FROM ws_docs")
      .select("s").as[Seq[String]].head()
    assert(ng == Seq("alpha beta", "beta gamma", "gamma alpha", "alpha beta"))
  }

  test("nfc_normalize composes decomposed accents; SQL-callable; scrubUnicode keeps every script") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // 'é' decomposed (e + combining acute) vs precomposed U+00E9
    val decomposed = "Café"
    val precomposed = "Café"
    val d = Seq((1L, decomposed), (2L, precomposed)).toDF("doc_id", "text")
    val norm = d.select(NfcNormalize(col("text")).as("n")).as[String].collect()
    assert(norm(0) == norm(1) && norm(0) == precomposed)
    d.createOrReplaceTempView("nfc_docs")
    val viaSql = spark.sql("SELECT nfc_normalize(text) AS n FROM nfc_docs WHERE doc_id = 1")
      .as[String].head()
    assert(viaSql == precomposed)
    // scrubUnicode: CJK / Cyrillic / accents survive; punctuation,
    // emoji and the ASCII-scrub-destroyed scripts normalize cleanly
    val mixed = Seq(
      (1L, "Héllo, Wörld!"), (2L, "你好，世界！ 123"),
      (3L, "Привет — мир?"), (4L, decomposed + "  x")
    ).toDF("doc_id", "text")
    val got = mixed
      .select(col("doc_id"), graft.ext.TextAnalysis.scrubUnicode(col("text")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "héllo wörld")
    assert(got(2L) == "你好 世界 123")
    assert(got(3L) == "привет мир")
    assert(got(4L) == "café x") // NFC unifies before the class filter
    // the ASCII scrub would have erased all of these scripts
    val ascii = mixed.filter(col("doc_id") === 2L)
      .select(graft.ext.TextAnalysis.scrub(col("text")).as("c")).as[String].head()
    assert(ascii == "123")
  }

  test("fix_mojibake unwinds CP1252/Latin-1 mis-decodes; clean text passes through") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // sloppy-CP1252 mis-decode (ftfy's model): the five bytes CP1252
    // leaves undefined come through as their C1 control, not U+FFFD —
    // Java's strict windows-1252 charset would destroy them
    def garble(s: String): String =
      s.getBytes("UTF-8").map { b =>
        val i = b & 0xFF
        if (i < 0x80 || i >= 0xA0) i.toChar
        else new String(Array(b), "windows-1252").charAt(0) match {
          case '�' => i.toChar
          case c => c
        }
      }.mkString
    val cafe = "café — €"                        // CP1252 specials + accent
    val once = garble(cafe)                      // "café â€" ...
    val twice = garble(once)
    val c1 = garble("māori")                     // UTF-8 C4 81 → Ä + C1 control
    val rows = Seq(
      (1L, once), (2L, twice), (3L, c1),
      (4L, "plain ascii"),                       // fast path: untouched
      (5L, "naïve Café prose"),                  // genuine Latin-1: untouched
      (6L, "Ã")                                  // lone lead byte: no valid decode
    ).toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.mojibakeRepair(rows)
      .as[(Long, Int, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((1, cafe)))
    assert(got(2L) == ((2, cafe)))               // double-encoding unwound twice
    assert(got(3L) == ((1, "māori")))            // sloppy-CP1252 C1 roundtrip
    assert(got(4L) == ((0, "plain ascii")))
    assert(got(5L) == ((0, "naïve Café prose"))) // é→E9 never valid UTF-8 here
    assert(got(6L) == ((0, "Ã")))
    // SQL surface matches the Column API
    rows.createOrReplaceTempView("moji_docs")
    val viaSql = spark.sql(
      "SELECT fix_mojibake(text) AS f, mojibake_rounds(text) AS r " +
        "FROM moji_docs WHERE doc_id = 2").as[(String, Int)].head()
    assert(viaSql == ((cafe, 2)))
  }

  test("vector_mean UDAF is SQL-callable and matches the typed Aggregator") {
    GraftExtensions.register(spark)
    load("embeddings").createOrReplaceTempView("emb_vm")
    val sqlRes = spark.sql(
      "SELECT label, vector_mean(embedding) AS centroid FROM emb_vm GROUP BY label")
      .as[(Int, Array[Double])].collect().toMap
    val typedRes = load("embeddings").select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1).mapValues(_._2)
      .agg((new VectorMean).toColumn.name("centroid"))
      .collect().toMap
    assert(sqlRes.keySet == typedRes.keySet)
    for (k <- sqlRes.keySet) {
      assert(sqlRes(k).length == 64)
      // same partial-aggregation algorithm either way; allow for
      // partition-order-dependent double summation between the two runs
      sqlRes(k).zip(typedRes(k)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9)
      }
    }
  }
}
