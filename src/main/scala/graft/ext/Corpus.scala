package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistics a training-data pipeline computes over the
  * whole document set — TF-IDF term weighting, token-budget sequence
  * packing, and n-gram language-model scoring (SURVEY.md §2.11).
  *
  * Every operator here is two map-reduce passes at most: a narrow
  * per-document pass plus one keyed aggregation over tokens. Nothing
  * holds per-corpus state on the driver; the corpus-wide statistics
  * (document frequency, bigram counts) are themselves DataFrames that
  * join back — broadcast-able when the vocabulary is small, shuffled
  * hash joins otherwise (Catalyst/AQE picks).
  *
  * All scoring math is engine-portable by construction: counts are
  * exact longs; each `ln` is taken once per key and rounded before any
  * summation; sums of rounded values go through DECIMAL so partition
  * order cannot change the result.
  */
object Corpus {

  /** Smoothed-idf TF-IDF, sklearn convention:
    * `idf = ln((N+1)/(df+1)) + 1`, `tfidf = tf · idf`, with the top
    * `topN` terms kept per document (ties broken by token asc).
    *
    * Shape at scale: tf is one shuffle on (doc, token); df is a
    * second, smaller aggregation over the tf result keyed by token;
    * the df join back is vocabulary-sized (broadcast-able). The
    * per-document top-N window partitions by doc_id — millions of
    * tiny partitions, never a global sort.
    *
    * `tfidf` is rounded to 6 decimals BEFORE ranking so the rank
    * order is identical in any engine evaluating `ln` within 1 ulp.
    */
  def tfidf(docs: DataFrame, topN: Int = 5,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // N is a 1-row aggregate broadcast-cross-joined into the scoring
    // job — no separate driver action, and the count branch is a
    // zero-column scan (parquet answers it from footer row counts)
    val nd = docs.agg(count(lit(1)).as("__n"))
    val tf = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "token").crossJoin(broadcast(nd))
      .withColumn("tfidf",
        round(col("tf") * (log((col("__n") + 1.0) / (col("df") + 1.0)) + 1.0), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("token").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topN)
      .select(col(idCol), col("token"), col("tf"), col("df"), col("tfidf"), col("rnk"))
  }

  /** Token-budget sequence packing — the concat-then-chunk form LLM
    * training actually uses: documents are laid out in a deterministic
    * order and cut into chunks of ~`budget` tokens; a document lands in
    * the chunk its starting token falls in.
    *
    * The layout order is (source, shard, doc_id) where
    * `shard = doc_id % nShards`: packing is independent per
    * (source, shard), so the running-sum window never sees more than
    * 1/nShards of a source — at 100 TB a handful of giant sources
    * would otherwise serialize into single window partitions. Raise
    * nShards with corpus size; chunk ids stay deterministic because
    * the shard function is content-addressed, not round-robin.
    *
    * Pure integer math (token counts, cumulative sums, true integer
    * division via `div`) — exactly reproducible in any SQL engine at
    * any magnitude (a double-division floor would only stay exact
    * while per-(source, shard) cumulative sums remain below 2^53).
    */
  def sequencePack(docs: DataFrame, budget: Int = 512, nShards: Int = 8,
                   idCol: String = "doc_id", textCol: String = "text",
                   sourceCol: String = "source"): DataFrame = {
    val perDoc = docs.select(
      col(sourceCol).as("source"),
      pmod(col(idCol), lit(nShards.toLong)).as("shard"),
      col(idCol).as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("source"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    perDoc
      .withColumn("__cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", expr(s"__cum div ${budget}L"))
      .groupBy(col("source"), col("shard"), col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** T5-style span-corruption preprocessing (Raffel et al. 2020; the
    * UL2 "R-denoiser" shape) — turn each document into the
    * `(input, target)` pair a denoising pretraining run consumes:
    * mask short token spans, replace each with an ordered sentinel
    * `<extra_id_k>` in the input, and emit the masked spans behind
    * their sentinels (plus the closing sentinel) as the target.
    *
    * RNG-free determinism: token positions are cut into fixed
    * `blockSize` blocks; block `b` of a document masks the two
    * positions starting at offset `md5(doc_id|b) % (blockSize - 2)` —
    * ~2/blockSize corruption rate with mean span 2, every full block
    * carries exactly one span so sentinel numbering is contiguous by
    * construction (T5's requirement), and the final partial block
    * degrades to a 1-token span or none. The whole pair is built with
    * indexed `transform`/`filter`/`slice` HOFs in ONE narrow
    * zero-shuffle pass — at 100 TB this runs at scan speed, the same
    * shape as the tokenizer-encode kernels. Zero-token docs are
    * omitted (no pair exists). */
  def spanCorrupt(docs: DataFrame, blockSize: Int = 10,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(blockSize >= 4, s"blockSize must be >= 4, got $blockSize")
    val startRange = blockSize - 2
    val toks = col("__toks")
    val n = size(toks).cast("long")
    val nBlocks = ceil(n.cast("double") / blockSize).cast("long")
    // md5-nibble span start for block b — the suite's RNG-free idiom
    def sB(b: Column): Column = pmod(
      instr(lit("0123456789abcdef"),
        substring(md5(concat(col(idCol).cast("string"), lit("|"),
          b.cast("string"))), 1, 1)) - 1,
      lit(startRange)).cast("long")
    def sentinel(b: Column) =
      concat(lit("<extra_id_"), b.cast("string"), lit(">"))
    val input = array_join(filter(
      transform(toks, (t, i) => {
        val b = floor(i.cast("double") / blockSize).cast("long")
        val off = pmod(i.cast("long"), lit(blockSize.toLong))
        when(off === sB(b), sentinel(b))
          .when(off === sB(b) + 1L, lit(null).cast("string"))
          .otherwise(t)
      }), x => x.isNotNull), " ")
    val blockSeq = sequence(lit(0L), nBlocks - 1L)
    def p0(b: Column) = b * blockSize + sB(b)
    val nSpans = size(filter(blockSeq, b => p0(b) < n)).cast("long")
    val nMasked = aggregate(blockSeq, lit(0L), (acc, b) =>
      acc + when(p0(b) < n, least(lit(2L), n - p0(b))).otherwise(0L))
    val spanPieces = filter(
      transform(blockSeq, b =>
        when(p0(b) < n, concat(sentinel(b), lit(" "),
          array_join(slice(toks, (p0(b) + 1L).cast("int"),
            least(lit(2L), n - p0(b)).cast("int")), " ")))
          .otherwise(lit(null).cast("string"))),
      x => x.isNotNull)
    val target = array_join(
      concat(spanPieces, array(sentinel(nSpans))), " ")
    docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .filter(size(toks) > 0)
      .select(col(idCol), n.as("n_tokens"), nSpans.as("n_spans"),
        nMasked.as("n_masked"), input.as("input"), target.as("target"))
  }

  /** Per-source vocabulary-growth census — the corpus-health report
    * behind Heaps'-law checks: token count, type (distinct-word)
    * count, hapax count (words occurring exactly once IN THAT
    * source), and the exact type/token and hapax/type ratios. An
    * outlier hapax ratio is the classic OCR-garbage / mojibake /
    * boilerplate-explosion signal — broken text mints endless
    * one-off "words", template text mints almost none.
    *
    * Scale shape: ONE map-side-combined group-by collapses the token
    * stream to (source, word, c) — vocabulary-bounded per source —
    * then a source-keyed roll-up; `count(*)` over that table IS the
    * type count and `c = 1` the hapax count, so there is no
    * countDistinct state anywhere. Ratios are single exact-input
    * double divisions (the q70 avg contract). Output
    * (source, n_tokens, n_types, n_hapax, type_token, hapax_ratio). */
  def vocabularyGrowth(docs: DataFrame, textCol: String = "text",
                       sourceCol: String = "source"): DataFrame =
    docs.select(col(sourceCol).as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("source"), col("word"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
        (col("n_types").cast("double") / col("n_tokens")).as("type_token"),
        (col("n_hapax").cast("double") / col("n_types")).as("hapax_ratio"))

  /** Count-of-counts table over the corpus bigram model — the
    * Good-Turing / Kneser-Ney smoothing-estimation input: for each
    * raw bigram count c, how many distinct bigrams occur exactly c
    * times (N_c). Discount estimation (`D = n1/(n1+2·n2)` and
    * friends) reads the first few rows; the whole table doubles as a
    * model-health curve (a missing n1 bulge means the corpus was
    * dedup-scrubbed hard). All-integer — exact in any engine.
    *
    * Scale shape: occurrence stream → model-sized pair table → the
    * ≤ max(c) row count-of-count roll-up; two map-side-combined
    * shuffles, nothing corpus-sized survives the first. Output
    * (c, n_c). */
  def countOfCounts(docs: DataFrame, n: Int = 2,
                    textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    docs.select(
        explode(graft.functions.TokenNgrams(TextAnalysis.tokens(col(textCol)), n))
          .as("ng"))
      .groupBy(col("ng")).agg(count(lit(1)).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("n_c"))
  }

  /** Shard manifest with order-free integrity checksums — what a
    * training run hands the loader next to the shards themselves:
    * per shard, doc/token counts and an id checksum any reader can
    * recompute to prove it got every document exactly once. The
    * checksum is the SUM of a 12-hex-digit md5 prefix per id,
    * accumulated as DECIMAL(38,0) — associative, order-free, exact,
    * so no id list is ever collected and a billion-doc shard sums
    * without overflow (content-level integrity stays with the
    * per-doc fingerprints; this manifest proves the SET of ids).
    * Built on [[shuffleShards]]' deterministic assignment. Output
    * (shard, n_docs, n_tokens, id_checksum).
    *
    * Scale shape: the shard assignment is narrow; the manifest is one
    * map-side-combined roll-up onto nShards rows. */
  def shardManifest(docs: DataFrame, nShards: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val idHash = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("decimal(38,0)")
    val toks = TextAnalysis.tokens(col(textCol))
    val perDoc = docs.select(col(idCol), size(toks).cast("long").as("__n"))
      .join(shuffleShards(docs, nShards, idCol).select(col(idCol), col("shard")),
        Seq(idCol))
    perDoc.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__n")).as("n_tokens"),
        // summed exactly as DECIMAL(38,0), emitted as STRING: 38
        // digits exceed double exactness, and hashed contracts carry
        // no decimal columns (driver-hash rule) — decimal→string is
        // exact and portable in both engines.
        sum(idHash).cast("decimal(38,0)").cast("string").as("id_checksum"))
  }

  /** Inverted index over the corpus: one posting row per distinct
    * (token, doc) — the search-side structure a document lake
    * materializes once so lookups never rescan text. Partitioned by
    * token at write time, a lookup reads only its tokens' postings. */
  def invertedIndex(docs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("token"))

  /** Conjunctive (AND) token search via posting-list intersection:
    * documents containing EVERY token of `phrase`. The classic
    * inverted-index query shape — work scales with the matched
    * postings, not the corpus: the token filter prunes the index scan
    * (partition pruning when the index is stored partitioned by
    * token), and the intersection is one count-match aggregation. */
  def searchAll(index: DataFrame, phrase: Seq[String],
                idCol: String = "doc_id"): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val terms = phrase.distinct
    // countDistinct, not count: correct for ANY (token, doc) posting
    // list, not just one already array_distinct'ed by invertedIndex
    index.filter(col("token").isin(terms: _*))
      .groupBy(col(idCol))
      .agg(countDistinct(col("token")).as("__hits"))
      .filter(col("__hits") === terms.size)
      .select(col(idCol))
  }

  /** Okapi BM25 ranking for a term query — the scoring half of corpus
    * search ([[searchAll]] being the boolean half): per matched
    * (doc, term), `idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avglen))`
    * with the standard k1=1.2, b=0.75, summed per document.
    *
    * Shape at scale — a term query has a FIXED handful of terms, so
    * nothing here needs a (doc, token) shuffle at all: per-term tf is
    * a per-row array count, and ALL corpus statistics (N, total
    * length, per-term document frequency) collapse into ONE 1-row
    * aggregate, broadcast into a second narrow scoring pass. Two
    * tokenization passes over the corpus, zero data shuffles, and the
    * ranking is a map-side top-k (TakeOrderedAndProject) — no driver
    * action, no postings materialization.
    *
    * Engine-portable by the same recipe as the LM score: each
    * per-(doc, term) score — idf × tf-saturation, one `ln` per term —
    * is rounded ONCE to 9 decimals, and the rounded scores sum as
    * DECIMAL (exact, so neither partition order nor per-row term order
    * can change a score or a rank). */
  def bm25(docs: DataFrame, terms: Seq[String], topN: Int = 10,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val q = terms.distinct
    // tokenize ONCE per row (`__toks` projection): Catalyst does not
    // CSE a non-cheap expression across sibling aggregate/select
    // expressions, so inlining tokens(text) into every per-term count
    // would re-tokenize each row 2+|q| times in the stats aggregate
    // and |q|+2 times in the scoring pass
    val toks = col("__toks")
    val tokDocs = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    def tfOf(t: String): Column =
      size(filter(toks, x => x === lit(t))).cast("long")
    val statExprs =
      Seq(count(lit(1)).as("__n"), sum(size(toks).cast("long")).as("__tot")) ++
        q.zipWithIndex.map { case (t, i) =>
          sum(when(tfOf(t) > 0, 1L).otherwise(0L)).as(s"__df$i")
        }
    val stats = tokDocs.agg(statExprs.head, statExprs.tail: _*)
    val len = size(toks).cast("long")
    val avgLen = col("__tot").cast("double") / col("__n")
    val perTerm = q.zipWithIndex.map { case (t, i) =>
      val tf = tfOf(t)
      val idf = log(lit(1.0) +
        (col("__n").cast("double") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5))
      val sat = (tf * 2.2) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * (len / avgLen)))
      when(tf > 0, round(idf * sat, 9).cast("decimal(28,9)"))
        .otherwise(lit(0).cast("decimal(28,9)"))
    }
    tokDocs.crossJoin(broadcast(stats))
      .filter(q.map(t => array_contains(toks, t)).reduce(_ || _))
      .select(col(idCol), perTerm.reduce(_ + _).cast("double").as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topN)
  }

  /** Batch BM25 retrieval — the serving/RAG-evaluation shape of
    * [[bm25]]: top-`topN` documents for EVERY query of a query set in
    * ONE corpus pass, with the identical per-term scoring recipe
    * (9-dp-rounded idf·saturation terms, DECIMAL-summed, so a query's
    * scores equal the single-query form term for term).
    *
    * Scale shape: the (query, term) table broadcasts; the corpus
    * tokenizes once and only tokens matching SOME query term survive
    * into the (doc, term) tf aggregation (map-side combined); df and
    * corpus stats are model-sized/1-row broadcasts; the per-query
    * ranking is the bounded TopK aggregator, so the final shuffle
    * carries ≤ topN·|Q| rows — never the candidate lists. Output
    * (query_id, rank, idCol, score). */
  def bm25Batch(docs: DataFrame, queries: Seq[(Long, Seq[String])],
                topN: Int = 10, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty),
      "bm25Batch needs at least one query, each with at least one term")
    val spark = docs.sparkSession
    import spark.implicits._
    val qt = queries.flatMap { case (qid, ts) => ts.distinct.map((qid, _)) }
      .toDF("query_id", "term")
    val tokDocs = docs.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    val stats = tokDocs.agg(count(lit(1)).as("__n"),
        sum(size(col("__toks")).cast("long")).as("__tot"))
      .withColumn("__k", lit(1))
    val lens = tokDocs.select(col(idCol), size(col("__toks")).cast("long").as("__len"))
    val tf = tokDocs.select(col(idCol), explode(col("__toks")).as("term"))
      .join(broadcast(qt.select("term").distinct()), Seq("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__tf"))
    val dfTbl = tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val avgLen = col("__tot").cast("double") / col("__n")
    val idf = log(lit(1.0) +
      (col("__n").cast("double") - col("__df") + 0.5) / (col("__df") + 0.5))
    val sat = (col("__tf") * 2.2) /
      (col("__tf") + lit(1.2) * (lit(0.25) + lit(0.75) * (col("__len") / avgLen)))
    val perQueryDoc = tf
      .join(broadcast(dfTbl), Seq("term"))
      .join(lens, Seq(idCol))
      .withColumn("__k", lit(1)).join(broadcast(stats), Seq("__k"))
      .select(col("term"), col(idCol),
        round(idf * sat, 9).cast("decimal(28,9)").as("__s"))
      .join(broadcast(qt), Seq("term"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("__s")).as("__score"))
    perQueryDoc.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topK(topN,
        col("__score").cast("double"), col(idCol)).as("__top"))
      .select(col("query_id"), posexplode(col("__top")).as(Seq("__pos", "__s")))
      .select(col("query_id"), (col("__pos") + 1).cast("long").as("rank"),
        col("__s.id").as(idCol), col("__s.ord").as("score"))
  }

  /** Vocabulary-indexed token encoding — the final corpus-prep step
    * that turns text into the integer sequences training consumes:
    * ids are assigned by corpus frequency rank (1 = most frequent,
    * ties toward the lexicographically smaller token, 0 = OOV for
    * tokens outside the top `vocabSize`), and each document emits one
    * `(doc_id, pos, token_id)` row per token position.
    *
    * The vocabulary ranking runs on the (tiny) aggregated token-count
    * table, and the id assignment joins it back to the positional
    * token stream — broadcast-sized at any corpus scale. The stream
    * itself is a narrow posexplode of the scan. */
  def encodeTokens(docs: DataFrame, vocabSize: Int = 100,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos0", "token")))
      .select(col(idCol), (col("pos0") + 1).cast("long").as("pos"), col("token"))
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("__c"))
    val vocab = counts
      .withColumn("token_id",
        row_number().over(Window.orderBy(col("__c").desc, col("token").asc)).cast("long"))
      .filter(col("token_id") <= vocabSize)
      .select(col("token"), col("token_id"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("token_id"), lit(0L)).as("token_id"))
  }

  /** Source-mixture sampling to a token budget — the curriculum step
    * that turns raw per-source corpora into a training mix: source `s`
    * should contribute ~`weights(s) · targetTokens` tokens (weights
    * are absolute shares, caller-normalized; unlisted sources get
    * `defaultWeight`), so each source is hash-sampled at
    * `f_s = min(1, weights(s)·targetTokens / tokens_s)` — capped when
    * a source is too small to meet its share.
    *
    * The sample is the same RNG-free md5-nibble threshold as
    * stratified sampling (granularity 1/256): reproducible across
    * runs, engines, partitionings and retries. One tiny per-source
    * aggregate (broadcast back) plus a narrow filter — the corpus
    * itself is scanned once. */
  def mixtureSample(docs: DataFrame, weights: Map[String, Double],
                    targetTokens: Long, defaultWeight: Double = 0.0,
                    idCol: String = "doc_id", textCol: String = "text",
                    sourceCol: String = "source"): DataFrame = {
    val perDoc = docs.select(col(idCol), col(sourceCol).as("source"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    val wCol = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (s, w)) => when(col("source") === s, lit(w)).otherwise(acc)
    }
    val thresholds = perDoc.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tok_s"))
      .select(col("source"),
        floor(least(lit(1.0), wCol * targetTokens.toDouble / col("tok_s")) * 256)
          .as("__thr"))
    val hx = md5(concat(col("source"), lit("|"), col(idCol).cast("string")))
    def nibAt(i: Int) = instr(lit("0123456789abcdef"), substring(hx, i, 1)) - 1
    perDoc.join(broadcast(thresholds), "source")
      .filter(nibAt(1) * 16 + nibAt(2) < col("__thr"))
      .select(col(idCol), col("source"), col("n_tokens"))
  }

  /** Corpus-trained bigram language-model score per document (an LM
    * perplexity proxy for quality filtering): MLE bigram probability
    * `P(t2|t1) = c(t1,t2) / c(t1,·)` trained on the corpus itself, and
    * each document scored by the sum and mean of its bigram log-probs.
    * Documents with fewer than 2 tokens have no bigrams and are
    * omitted (score undefined).
    *
    * Same execution recipe as [[trigramLogProb]], one order down: the
    * occurrence stream is one native `token_ngrams` kernel pass,
    * checkpointed for its two consumers (pair-count build + score
    * join); the bigram STRING is bijective with the token pair (tokens
    * are whitespace-split), so shuffles carry one key column; the
    * prefix count attaches as a window aggregate over the model-sized
    * pair table (one exchange, no self-join). Each `ln` is rounded to
    * 9 decimals and summed as DECIMAL(28,9): the per-document sum is
    * exact and partition-order-free, so it reproduces bit-for-bit in
    * any engine whose `ln` is within 1 ulp.
    */
  def bigramLogProb(docs: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bigrams = docs.select(col(idCol),
        explode(graft.functions.TokenNgrams(TextAnalysis.tokens(col(textCol)), 2))
          .as("bg"))
      .localCheckpoint()
    val pairCounts = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("c_pair"))
    val model = pairCounts
      .withColumn("c_prefix", sum(col("c_pair"))
        .over(Window.partitionBy(substring_index(col("bg"), " ", 1))))
      .select(col("bg"),
        round(log(col("c_pair").cast("double") / col("c_prefix")), 9)
          .cast("decimal(28,9)").as("logprob"))
    bigrams.join(model, Seq("bg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("logprob")).as("__sum"))
      .select(col(idCol), col("n_bigrams"),
        col("__sum").cast("double").as("sum_logprob"),
        (col("__sum").cast("double") / col("n_bigrams")).as("avg_logprob"))
  }

  /** Interpolated Kneser–Ney bigram LM scoring (Kneser & Ney 1995;
    * Chen & Goodman 1999's fixed-discount form) — the smoothing
    * production n-gram perplexity filters actually use, one rung
    * above [[trigramLogProb]]'s plain interpolation: per bigram
    * position,
    * `p(w2|w1) = max(c12−D, 0)/c1 + D·N1+(w1·)/c1 · N1+(·w2)/N1+(··)`
    * — the discount mass freed from seen bigrams is given to the
    * CONTINUATION probability (how many distinct contexts a word
    * completes), the insight that makes KN the standard ("Francisco"
    * is frequent but only ever follows "San", so its unigram backoff
    * weight should be tiny).
    *
    * Shape at scale — everything derives from the bigram-pair table,
    * hierarchically (the trigram-LM recipe): one map-side-combined
    * group-by collapses the occurrence stream to c12; c1 and the two
    * continuation counts N1+(w1·), N1+(·w2) are window aggregates
    * over that MODEL-SIZED table (`count(*)` per w1/w2 over distinct
    * bigram rows IS the distinct-continuation count — no
    * countDistinct state); N1+(··) is a 1-row broadcast. Determinism:
    * all counts exact longs, the probability is assembled in double
    * from exact inputs (correctly-rounded ops, identical cross-
    * engine), each `ln` rounded once to 9 dp, per-doc sums DECIMAL.
    * Output (idCol, n_bigrams, sum_logprob, avg_logprob). */
  /** Interpolated Kneser–Ney at TRIGRAM order — the production
    * perplexity-filter depth, one rung above [[kneserNeyLogProb]]:
    * `p(w3|w1w2) = max(c123−D,0)/c12 + D·N1+(w1w2·)/c12 · p_bi(w3|w2)`
    * where the backoff `p_bi` is the continuation-count KN bigram
    * (`max(N1+(·w2w3)−D,0)/N1+(·w2·) + D·N1+(w2·)/N1+(·w2·)·pcont(w3)`,
    * `pcont = N1+(·w3)/N1+(··)`) — every lower-order statistic derived
    * hierarchically from the trigram TYPE table (Chen & Goodman's
    * formulation; the q101 derivation convention, so c12 is the
    * trigram-prefix mass).
    *
    * Shape at scale: ONE corpus-scale group-by collapses the trigram
    * occurrence stream; everything else is window aggregates over the
    * model-sized type table and its (w2,w3) continuation roll-up —
    * `count(*)` per partition over TYPE rows IS each distinct-
    * continuation count, no countDistinct state; N1+(··) is a 1-row
    * broadcast. Determinism: counts exact longs, probability
    * assembled left-associatively in double from exact inputs, ln
    * rounded once to 9 dp, per-doc sums DECIMAL — the q118 contract.
    * Output (idCol, n_trigrams, sum_logprob, avg_logprob). */
  def kneserNeyTrigramLogProb(docs: DataFrame, discount: Double = 0.75,
                              idCol: String = "doc_id",
                              textCol: String = "text"): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val tris = docs.select(col(idCol),
        explode(graft.functions.TokenNgrams(TextAnalysis.tokens(col(textCol)), 3))
          .as("tg"))
      .localCheckpoint()
    val t = tris.groupBy(col("tg")).agg(count(lit(1)).as("c123"))
    val w12 = substring_index(col("tg"), " ", 2)
    val w23 = substring_index(col("tg"), " ", -2)
    val top = t
      .withColumn("c12", sum(col("c123")).over(Window.partitionBy(w12)))
      .withColumn("n1p12", count(lit(1)).over(Window.partitionBy(w12)))
      .withColumn("mk", w23)
    val m = t.groupBy(w23.as("mk")).agg(count(lit(1)).as("nMid"))
    val mw2 = substring_index(col("mk"), " ", 1)
    val mw3 = substring_index(col("mk"), " ", -1)
    val npp = m.agg(count(lit(1)).as("__npp"))
    val pbi = m
      .withColumn("nMidDen", sum(col("nMid")).over(Window.partitionBy(mw2)))
      .withColumn("n1pw2", count(lit(1)).over(Window.partitionBy(mw2)))
      .withColumn("n1pw3", count(lit(1)).over(Window.partitionBy(mw3)))
      .crossJoin(broadcast(npp))
      .select(col("mk"),
        (greatest(col("nMid") - discount, lit(0.0)) / col("nMidDen")
          + lit(discount) * col("n1pw2") / col("nMidDen")
          * (col("n1pw3").cast("double") / col("__npp"))).as("pbi"))
    val model = top.join(pbi, Seq("mk"))
      .select(col("tg"),
        round(log(
          greatest(col("c123") - discount, lit(0.0)) / col("c12")
            + lit(discount) * col("n1p12") / col("c12") * col("pbi")), 9)
          .cast("decimal(28,9)").as("logprob"))
    tris.join(model, Seq("tg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("logprob")).as("__sum"))
      .select(col(idCol), col("n_trigrams"),
        col("__sum").cast("double").as("sum_logprob"),
        (col("__sum").cast("double") / col("n_trigrams")).as("avg_logprob"))
  }

  def kneserNeyLogProb(docs: DataFrame, discount: Double = 0.75,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(discount > 0 && discount < 1, s"discount must be in (0,1), got $discount")
    val bigrams = docs.select(col(idCol),
        explode(graft.functions.TokenNgrams(TextAnalysis.tokens(col(textCol)), 2))
          .as("bg"))
      .localCheckpoint()
    val c12 = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val w1 = substring_index(col("bg"), " ", 1)
    val w2 = substring_index(col("bg"), " ", -1)
    val nPlusAll = c12.agg(count(lit(1)).as("__npp"))
    val model = c12
      .withColumn("c1", sum(col("c12")).over(Window.partitionBy(w1)))
      .withColumn("n1p_w1", count(lit(1)).over(Window.partitionBy(w1)))
      .withColumn("n1p_w2", count(lit(1)).over(Window.partitionBy(w2)))
      .crossJoin(broadcast(nPlusAll))
      .select(col("bg"),
        round(log(
          greatest(col("c12") - discount, lit(0.0)) / col("c1")
            + lit(discount) * col("n1p_w1") / col("c1")
            * (col("n1p_w2").cast("double") / col("__npp"))), 9)
          .cast("decimal(28,9)").as("logprob"))
    bigrams.join(model, Seq("bg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("logprob")).as("__sum"))
      .select(col(idCol), col("n_bigrams"),
        col("__sum").cast("double").as("sum_logprob"),
        (col("__sum").cast("double") / col("n_bigrams")).as("avg_logprob"))
  }

  /** Interpolated trigram LM scoring — the higher-order form of
    * [[bigramLogProb]]: per trigram position,
    * `p = λ3·c(w1w2w3)/c(w1w2·) + λ2·c(w2w3·)/c(w2··) + λ1·c(w3·)/N`,
    * all counts taken over the corpus's trigram stream (so every ratio
    * is exact-integer-over-exact-integer in double), combined
    * left-to-right, `ln` rounded to 9 decimals, per-document sums as
    * DECIMAL(28,9) — partition-order-free and engine-reproducible, the
    * q70 determinism recipe one order up. Interpolation means unseen
    * combinations back off smoothly instead of -∞ (the reason
    * production perplexity filters interpolate).
    * Output (idCol, n_trigrams, sum_logprob, avg_logprob). */
  def trigramLogProb(docs: DataFrame,
                     l3: Double = 0.7, l2: Double = 0.2, l1: Double = 0.1,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // shape at scale, measured stage by stage on the bench corpus:
    //  - the occurrence stream is ONE native-kernel pass
    //    (graft.functions.TokenNgrams — a compiled window loop per
    //    row; the composable transform/sequence/element_at
    //    construction was the dominant per-row cost), checkpointed
    //    once for its two consumers (c123 build + score join);
    //  - every lower-order count (c12/c23/c2/c3/n) derives from the
    //    c123 table — the occurrence stream is aggregated exactly
    //    once, never four times — and the derivation is HIERARCHICAL:
    //    on corpora where most trigrams are unique, c123 is nearly
    //    occurrence-sized, so only TWO c123-scale exchanges are paid
    //    (the c12 window and the c23-table join; AQE broadcasts the
    //    bigram table when it fits, removing the second). c23 comes
    //    off c123 via a map-side-combined group-by (the shuffle
    //    carries per-task partials, not rows), and c2/c3 collapse
    //    from the MODEL-SIZED c23 table — where four flat windows
    //    each exchanged the full near-occurrence-sized c123;
    //  - tokens are whitespace-split (never contain a space), so the
    //    joined trigram STRING is bijective with the token tuple:
    //    grouping/joining carries ONE string key instead of three,
    //    and the constituent bigrams/unigrams recover exactly via
    //    substring_index on the model-sized table;
    //  - n is a 1-row broadcast aggregate; c123 is checkpointed for
    //    its two consumers (windows chain + n).
    val tris = docs.select(col(idCol),
        explode(graft.functions.TokenNgrams(TextAnalysis.tokens(col(textCol)), 3))
          .as("tri"))
      .localCheckpoint()
    val c123 = tris.groupBy("tri").agg(count(lit(1)).as("c123"))
      .localCheckpoint()
    val n = c123.agg(sum(col("c123")).as("__n"))
    val t12 = substring_index(col("tri"), " ", 2)
    val t23 = substring_index(col("tri"), " ", -2)
    // hierarchical lower-order tables: c23 collapses c123 once (a
    // map-side-combined group-by, so the shuffle carries per-task
    // partials), then c2/c3 attach as windows over the MODEL-SIZED
    // c23 table — never the trigram table again. Two wins at scale
    // over the previous flat four-windows-over-c123 form: (1) two
    // near-occurrence-sized exchanges become bigram-model-sized ones;
    // (2) the flat c2 window partitioned the WHOLE trigram table by
    // its single middle token — at crawl scale every "<x> the <y>"
    // trigram lands in one window task (Zipf skew bomb); here the
    // single-token windows only ever see the collapsed bigram table.
    // Local price (the q98-style trade): the model assembly gains a
    // join stage, ~+0.2 s on the sf0.1 bench against corpus-scale
    // work removed at 100 TB.
    val c23e = c123.groupBy(t23.as("bg")).agg(sum(col("c123")).as("c23"))
      .withColumn("c2", sum(col("c23")).over(
        Window.partitionBy(substring_index(col("bg"), " ", 1))))
      .withColumn("c3", sum(col("c23")).over(
        Window.partitionBy(substring_index(col("bg"), " ", -1))))
    val model = c123
      .withColumn("c12", sum(col("c123")).over(Window.partitionBy(t12)))
      .join(c23e, t23 === col("bg"))
      .crossJoin(broadcast(n))
      .select(col("tri"),
        round(log(
          lit(l3) * (col("c123").cast("double") / col("c12"))
            + lit(l2) * (col("c23").cast("double") / col("c2"))
            + lit(l1) * (col("c3").cast("double") / col("__n"))), 9)
          .cast("decimal(28,9)").as("logprob"))
    val scored = tris.join(model, Seq("tri"))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("logprob")).as("__sum"))
      .select(col(idCol), col("n_trigrams"),
        col("__sum").cast("double").as("sum_logprob"),
        (col("__sum").cast("double") / col("n_trigrams")).as("avg_logprob"))
  }

  /** CCNet-style perplexity tail filter: score every document with the
    * corpus-trained bigram LM ([[bigramLogProb]]), find each source's
    * exact `tailFrac` quantile of `avg_logprob` (the boundary of the
    * worst-perplexity tail), and keep only documents STRICTLY above
    * it. Value-thresholded, so ties at the cutoff are dropped as a
    * block — deterministic on every engine, no rank tie-break to
    * reproduce. Documents with fewer than 2 tokens have no bigrams,
    * hence no score, and are dropped with the tail (no signal ⇒ no
    * keep, the conservative curation default).
    *
    * Scale: the LM scoring is [[bigramLogProb]]'s shape (one
    * occurrence-stream pass, model-sized LM join); the per-source
    * cutoff goes through [[graft.ops.Scale.kthSmallestByKey]]'s
    * two-pass histogram, NOT a whole-stratum window sort, and the
    * cutoff table joined back is one row per source. Output:
    * (keyCol, idCol, n_bigrams, avg_logprob) for surviving docs.
    *
    * Reference scope: no LM surface in the reference; this is the
    * standard perplexity-filtering stage of crawl curation (CCNet's
    * head/middle retention), composed from this engine's own pieces. */
  def perplexityTailFilter(docs: DataFrame, tailFrac: Double = 0.25,
                           keyCol: String = "source", idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    require(tailFrac > 0.0 && tailFrac < 1.0,
      s"tailFrac must be in (0, 1), got $tailFrac")
    // scored feeds both the cutoff computation and the final filter;
    // materialize so the LM scoring pipeline runs once
    val scored = bigramLogProb(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(keyCol)), Seq(idCol))
      .localCheckpoint()
    val cut = graft.ops.Scale
      .kthSmallestByKey(scored, "avg_logprob", keyCol, tailFrac)
      .select(col(keyCol), col("quantile").as("__cut"))
    scored.join(cut, Seq(keyCol))
      .filter(col("avg_logprob") > col("__cut"))
      .select(col(keyCol), col(idCol), col("n_bigrams"), col("avg_logprob"))
  }

  /** CCNet's actual three-way split — [[perplexityTailFilter]] keeps
    * or drops, this LABELS: per-source exact `loFrac`/`hiFrac`
    * quantiles of the bigram-LM `avg_logprob` cut each source into
    * `tail` (worst perplexity, ≤ lo cut), `middle`, and `head`
    * (best, > hi cut) — the buckets CCNet feeds to different
    * training-mixture weights instead of discarding outright.
    * Value-thresholded at both cuts (ties bucket together, no rank
    * tie-break to reproduce); scoreless <2-token docs are absent, the
    * conservative default. Scale shape = the tail filter's: one LM
    * scoring pass, ONE multi-quantile histogram pass for both cuts (no
    * whole-stratum window sort), one one-row-per-source cut join. */
  def perplexityBuckets(docs: DataFrame, loFrac: Double = 1.0 / 3,
                        hiFrac: Double = 2.0 / 3,
                        keyCol: String = "source", idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    require(0 < loFrac && loFrac < hiFrac && hiFrac < 1,
      s"need 0 < loFrac < hiFrac < 1, got ($loFrac, $hiFrac)")
    val scored = bigramLogProb(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(keyCol)), Seq(idCol))
      .localCheckpoint()
    val q = graft.ops.Scale
      .kthSmallestByKeyMulti(scored, "avg_logprob", keyCol, Seq(loFrac, hiFrac))
    val cuts = q.groupBy(col(keyCol)).agg(
      max(when(col("p") === loFrac, col("quantile"))).as("__lo"),
      max(when(col("p") === hiFrac, col("quantile"))).as("__hi"))
    scored.join(cuts, Seq(keyCol))
      .select(col(keyCol), col(idCol), col("n_bigrams"), col("avg_logprob"),
        when(col("avg_logprob") <= col("__lo"), "tail")
          .when(col("avg_logprob") <= col("__hi"), "middle")
          .otherwise("head").as("bucket"))
  }

  /** Deterministic EXACT token-budget sample: per `keyCol` stratum,
    * take documents in md5-priority order until the NEXT one would
    * push the running token total past `budgetTokens` — the greedy
    * prefix that lands as close under an exact per-source budget as
    * whole documents allow. [[mixtureSample]] hits a budget only in
    * expectation (rate thresholding); this form is exact, for the
    * "2B tokens of src0, not 2B ± 5%" contracts data agreements
    * impose. RNG-free: the same prefix on every run and engine.
    *
    * Scale — two-pass exact prefix, NO whole-stratum sort: a single
    * `Window.partitionBy(key)` cumsum would sort every document of a
    * source in ONE task, and the mega-source (half the crawl from one
    * domain) is precisely the input this operator exists for. Instead
    * the md5 priority's first two nibbles split each stratum into 256
    * order-preserving buckets (the hex prefix IS the sort prefix):
    * pass 1 aggregates per-(key, bucket) token totals and prefix-sums
    * them over the ≤256-row-per-key bucket table; buckets whose
    * preceding total already exceeds the budget are discarded BEFORE
    * any per-document work; pass 2 windows only the surviving buckets,
    * partitioned by (key, bucket) — each sort task sees ~1/256 of a
    * stratum, and entire post-cutoff regions are never sorted at all.
    * The per-document running total (`__prev` + in-bucket cumsum)
    * equals the global cumsum exactly: long arithmetic, same order. */
  def tokenBudgetSample(docs: DataFrame, budgetTokens: Long,
                        keyCol: String = "source", idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val n = size(TextAnalysis.tokens(col(textCol))).cast("long")
    val hx = md5(concat(col(keyCol).cast("string"), lit("|"), col(idCol).cast("string")))
    def nibAt(c: Column, i: Int): Column =
      instr(lit("0123456789abcdef"), substring(c, i, 1)) - 1
    val base = docs.select(col(keyCol), col(idCol), n.as("n_tokens"), hx.as("__h"))
      .withColumn("__b", (nibAt(col("__h"), 1) * 16 + nibAt(col("__h"), 2)).cast("int"))
    // pass 1: per-(key, bucket) totals; running total over the tiny
    // bucket table (≤256 rows per key — the window input is bounded by
    // construction, not by data). `__prev` = tokens in all earlier
    // buckets of the stratum.
    val wb = Window.partitionBy(col(keyCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val live = base.groupBy(col(keyCol), col("__b"))
      .agg(sum(col("n_tokens")).as("__bt"))
      .withColumn("__prev", coalesce(sum(col("__bt")).over(wb), lit(0L)))
      // a bucket whose preceding total already exceeds the budget can
      // contribute no kept doc (cum ≥ __prev > budget; n_tokens ≥ 0 —
      // ≤, not <: a zero-token doc at exactly __prev == budget is kept)
      .filter(col("__prev") <= budgetTokens)
      .select(col(keyCol), col("__b"), col("__prev"))
    // pass 2: per-document cumsum inside surviving buckets only.
    // `live` is ≤256 rows/key — tiny for a handful of sources but
    // key-count-proportional, so the broadcast decision is left to
    // AQE's runtime size (a million-source corpus shuffle-joins here).
    val wd = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col("__h"), col(idCol))
    base.join(live, Seq(keyCol, "__b"))
      .withColumn("cum_tokens", col("__prev") + sum(col("n_tokens")).over(wd))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col(keyCol), col(idCol), col("n_tokens"), col("cum_tokens"))
  }

  /** Per-source document cap — crawl curation's "no domain dominates
    * the mix" rule: keep at most `maxDocs` documents per `keyCol`,
    * ranked by `ordCol` descending with min-id tiebreak. Output:
    * (keyCol, rnk, idCol, ord).
    *
    * Runs through the bounded `TopK` Aggregator, NOT
    * `row_number().over(Window.partitionBy(source))`: the window form
    * shuffles the ENTIRE corpus to per-source partitions and sorts
    * each one (and a mega-source — half the crawl from one domain —
    * lands in a single task), while the Aggregator's map-side partial
    * keeps ≤ maxDocs rows per source per task, so the shuffle carries
    * the cap, not the corpus, and skew is bounded by design. */
  def capPerSource(docs: DataFrame, maxDocs: Int, ordCol: Column,
                   keyCol: String = "source", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(keyCol))
      .agg(graft.functions.TopK.topK(maxDocs, ordCol.cast("double"), col(idCol)).as("top"))
      .select(col(keyCol), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col(keyCol), (col("pos") + 1).cast("long").as("rnk"),
        col("s.id").as(idCol), col("s.ord").as("ord"))

  /** DSIR-style importance resampling (Xie et al. 2023,
    * arXiv:2302.03169): select raw-corpus documents whose hashed
    * n-gram distribution looks like the TARGET corpus. Per hashed
    * bucket `b`, a Laplace-smoothed log-ratio
    * `Δ_b = ln p_target(b) − ln p_raw(b)` is computed over the two
    * corpora's token streams; a document's importance is its
    * per-token average `L̄_d = (Σ_b c_db·Δ_b)/n_d`, and `k` documents
    * are drawn without replacement with weight `exp(L̄_d)` via the
    * same deterministic Efraimidis–Spirakis machinery as
    * `TextAnalysis.weightedSample` (md5 uniforms, bounded TopK — the
    * shuffle carries the sample, not the corpus).
    *
    * Scale shape: two token-stream aggregations collapse each corpus
    * to a `buckets`-row model joined back as a broadcast; per-doc
    * scoring is one keyed aggregation; selection is a map-side-partial
    * global top-k. Engine-reproducible: each `ln` is rounded once
    * (9 dp) and carried as DECIMAL, so the per-doc sum
    * `Σ c_db·Δ_b` is exact in any summation order.
    * Output (rnk, idCol, n_tokens, avg_logratio, log_priority). */
  def dsirSample(raw: DataFrame, target: DataFrame, k: Int, buckets: Int = 256,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0 && buckets > 0, "need k/buckets > 0")
    val spark = raw.sparkSession
    val toks = TextAnalysis.tokens(col(textCol))
    def bucketCounts(df: DataFrame, cName: String) = df
      .select(explode(toks).as("__t"))
      .select(pmod(Dedup.hash16(col("__t")), lit(buckets.toLong)).as("__bkt"))
      .groupBy(col("__bkt")).agg(count(lit(1)).as(cName))
    val tTot = target.select(explode(toks).as("__t")).agg(count(lit(1)).as("__nt"))
    val rTot = raw.select(explode(toks).as("__t")).agg(count(lit(1)).as("__nr"))
    // decimal(12,9), NOT wider: a long x decimal(28,9) product
    // overflows precision 38 and Spark's allowPrecisionLoss rule
    // silently cuts the product to scale 6 — the exactness this whole
    // recipe exists for would be lost. |ln p| < 100 here, so 3
    // integer digits + 9 scale fit in (12,9), and the c x delta
    // product stays an exact decimal(34,9).
    def smoothedLog(c: Column, n: Column): Column =
      round(log((coalesce(c, lit(0L)) + lit(1.0)) / (n + lit(buckets.toDouble))), 9)
        .cast("decimal(12,9)")
    val delta = spark.range(buckets).select(col("id").as("__bkt"))
      .join(bucketCounts(target, "__ct"), Seq("__bkt"), "left")
      .join(bucketCounts(raw, "__cr"), Seq("__bkt"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("__bkt"),
        (smoothedLog(col("__ct"), col("__nt"))
          - smoothedLog(col("__cr"), col("__nr"))).as("__delta"))
    val feat = raw
      .select(col(idCol), size(toks).cast("long").as("n_tokens"),
        explode(toks).as("__t"))
      .select(col(idCol), col("n_tokens"),
        pmod(Dedup.hash16(col("__t")), lit(buckets.toLong)).as("__bkt"))
      .groupBy(col(idCol), col("n_tokens"), col("__bkt"))
      .agg(count(lit(1)).as("__c"))
    // materialized ONCE: the top-k selection and the attribute
    // join-back both read `scored`, and lazily each would re-run the
    // full token-explode + hash pass over the raw corpus; the scored
    // table is three scalars per doc — the standard narrow
    // stage-boundary persist point
    val scored = feat.join(broadcast(delta), Seq("__bkt"))
      .groupBy(col(idCol), col("n_tokens"))
      .agg(sum(col("__c") * col("__delta")).as("__L"))
      .select(col(idCol), col("n_tokens"),
        (col("__L").cast("double") / col("n_tokens")).as("avg_logratio"))
      .localCheckpoint(eager = false)
    val hx = md5(concat(lit("dsir|"), col(idCol).cast("string")))
    def nibAt(i: Int) = instr(lit("0123456789abcdef"), substring(hx, i, 1)) - 1
    val v = (1 to 13).foldLeft(lit(0L)) { (acc, i) => acc * 16 + nibAt(i).cast("long") }
    val u = (v.cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val pri = round(log(u) / exp(col("avg_logratio")), 9)
    val sel = scored
      .agg(graft.functions.TopK.topK(k, pri, col(idCol)).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "s")))
      .select((col("pos") + 1).cast("long").as("rnk"),
        col("s.id").as(idCol), col("s.ord").as("log_priority"))
    sel.join(scored.select(col(idCol), col("n_tokens"), col("avg_logratio")),
        Seq(idCol))
      .select(col("rnk"), col(idCol), col("n_tokens"),
        col("avg_logratio"), col("log_priority"))
  }

  /** Moore–Lewis cross-entropy difference selection (Moore & Lewis
    * 2010, "Intelligent selection of language model training data"):
    * score each raw-corpus document by
    * `avg over its bigrams of (ln p_in(bg) − ln p_gen(bg))` — how much
    * better an IN-DOMAIN bigram LM explains the document than the
    * general-corpus LM trained on `raw` itself — and keep the top `k`.
    * The model-based sibling of [[dsirSample]]'s hashed-n-gram
    * importance weights: DSIR matches a bucketed token distribution,
    * Moore–Lewis ranks by an actual LM likelihood ratio.
    *
    * Unseen handling: every raw bigram is in the general model by
    * construction; a bigram absent from the (much smaller) in-domain
    * model gets the floor `ln(1/(N_in + 1))` (N_in = total in-domain
    * bigram occurrences) — a 1-row aggregate broadcast into the
    * scoring pass, the same replacement-for-a-driver-action shape as
    * [[tfidf]]'s N.
    *
    * Shape at scale: both models are distinct-bigram-sized group-bys
    * with map-side combine; the scoring joins are occurrence × model
    * (broadcast-able when the vocabulary is bounded, shuffled hash
    * joins otherwise); selection is the bounded
    * [[graft.functions.TopK]] aggregator — the shuffle carries ≤ k
    * rows per map task, never the scored corpus. Determinism: counts
    * are exact longs, each `ln` rounded once to 9 dp into DECIMAL,
    * per-doc sums DECIMAL (order-free), ties at the cut broken by
    * doc id — identical to `ORDER BY avg_delta DESC, id LIMIT k`.
    *
    * Output: (rnk, idCol, n_bigrams, avg_delta), best first. */
  def mooreLewisSelect(raw: DataFrame, inDomain: DataFrame, k: Int,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k > 0, "need k > 0")
    def bigrams(df: DataFrame) = df.select(col(idCol),
      explode(graft.functions.TokenNgrams(TextAnalysis.tokens(col(textCol)), 2)).as("bg"))
    def model(bgs: DataFrame, lpName: String) = bgs
      .groupBy(col("bg")).agg(count(lit(1)).as("c_pair"))
      .withColumn("c_prefix", sum(col("c_pair"))
        .over(Window.partitionBy(substring_index(col("bg"), " ", 1))))
      .select(col("bg"),
        round(log(col("c_pair").cast("double") / col("c_prefix")), 9)
          .cast("decimal(12,9)").as(lpName))
    // raw bigrams feed BOTH the general model and the scoring join —
    // cut the lineage so the explode runs once, not twice
    val rawBg = bigrams(raw).localCheckpoint(eager = false)
    val inBg = bigrams(inDomain).localCheckpoint(eager = false)
    val floorRow = inBg
      .agg(round(log(lit(1.0) / (count(lit(1)) + lit(1)).cast("double")), 9)
        .cast("decimal(12,9)").as("__lp_floor"))
    val scored = rawBg
      .join(model(rawBg, "__lp_gen"), Seq("bg"))
      .join(model(inBg, "__lp_in"), Seq("bg"), "left")
      .crossJoin(broadcast(floorRow))
      // decimal(12,9) − decimal(12,9) → exact decimal(13,9); the sum
      // stays DECIMAL so partition order cannot change the result
      .select(col(idCol),
        (coalesce(col("__lp_in"), col("__lp_floor")) - col("__lp_gen")).as("__d"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__d")).as("__sum"))
      .select(col(idCol), col("n_bigrams"),
        (col("__sum").cast("double") / col("n_bigrams")).as("avg_delta"))
    val sel = scored
      .agg(graft.functions.TopK.topK(k, col("avg_delta"), col(idCol).cast("long")).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "s")))
      .select((col("pos") + 1).cast("long").as("rnk"),
        col("s.id").as(idCol), col("s.ord").as("avg_delta"))
    sel.join(scored.select(col(idCol), col("n_bigrams")), Seq(idCol))
      .select(col("rnk"), col(idCol), col("n_bigrams"), col("avg_delta"))
  }

  /** Distinct-n corpus diversity (Li et al. 2016, arXiv:1510.03055's
    * distinct-1/distinct-2 adapted corpus-side): per group and n-gram
    * width, the number of DISTINCT n-grams, the total n-gram count,
    * and their ratio — the standard report for spotting a collapsed /
    * over-duplicated source before training (a near-zero distinct
    * ratio at n=2,3 means the source is templated boilerplate).
    *
    * Shape at scale: one explode per width (the occurrence stream,
    * widths unioned), then a two-level aggregation — (group, n, gram)
    * with map-side combine collapses to distinct-gram rows, and the
    * second group-by is model-sized. No countDistinct state, no
    * windows. Output: (groupCol, n, n_distinct, n_total,
    * distinct_ratio) — exact longs, ratio an exact-inputs double. */
  def ngramDiversity(docs: DataFrame, ns: Seq[Int] = Seq(1, 2, 3),
                     groupCol: String = "source", textCol: String = "text"): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "n-gram widths must be >= 1")
    val toks = TextAnalysis.tokens(col(textCol))
    val occurrences = ns.map { n =>
      docs.select(col(groupCol), lit(n).as("n"),
        explode(graft.functions.TokenNgrams(toks, n)).as("__g"))
    }.reduce(_ unionByName _)
    occurrences
      .groupBy(col(groupCol), col("n"), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol), col("n"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("__c")).as("n_total"))
      .select(col(groupCol), col("n"), col("n_distinct"), col("n_total"),
        (col("n_distinct").cast("double") / col("n_total")).as("distinct_ratio"))
  }

  /** Temperature-scaled source mixing weights (the multilingual
    * LM recipe — Devlin et al. 2019 App. A, Conneau et al. 2020 §3:
    * sample source s with probability ∝ n_s^α) at α = 0.5: big
    * sources are DOWN-weighted relative to their size, small sources
    * up-weighted, so one giant crawl cannot drown the tail. α is
    * fixed at 1/2 deliberately — n^0.5 is `sqrt`, correctly rounded
    * in every IEEE engine, where a general `pow(x, α)` differs
    * across libm implementations and would break cross-engine
    * reproducibility (the repo's exactness recipe).
    *
    * Shape at scale: one map-side-combined group-by to per-source
    * token totals (a model-sized table), sqrt rounded to 9 dp into
    * DECIMAL so the normalizing sum is partition-order-free, the
    * 1-row total broadcast back (the q68/tfidf class). Output:
    * (groupCol, n_tokens, weight), weights summing to ≈1. */
  def temperatureWeights(docs: DataFrame, groupCol: String = "source",
                         textCol: String = "text"): DataFrame = {
    val perSource = docs
      .select(col(groupCol), size(TextAnalysis.tokens(col(textCol))).cast("long").as("__n"))
      .groupBy(col(groupCol)).agg(sum(col("__n")).as("n_tokens"))
      .select(col(groupCol), col("n_tokens"),
        round(sqrt(col("n_tokens").cast("double")), 9).cast("decimal(28,9)").as("__sq"))
    val total = perSource.agg(sum(col("__sq")).as("__ts"))
    perSource.crossJoin(broadcast(total))
      .select(col(groupCol), col("n_tokens"),
        round(col("__sq").cast("double") / col("__ts").cast("double"), 9).as("weight"))
  }

  /** Population Stability Index between two corpus slices'
    * length distributions — the standard drift monitor (credit-risk
    * lineage, applied to data pipelines: PSI < 0.1 stable, 0.1–0.25
    * drifting, > 0.25 a different population). Documents bucket by
    * `floor(n_chars / bucketWidth)` (the q43 histogram), each side's
    * per-bucket share is Laplace-smoothed `(c+1)/(N+B)` so an empty
    * bucket cannot produce ±∞, and the per-bucket contribution is
    * `(p−q)·ln(p/q)` — non-negative, summing to the PSI.
    *
    * Shape at scale: two map-side-combined histogram aggregations
    * collapse both corpora to ≤ B rows each; the totals are a 1-row
    * aggregate broadcast back into the bucket table (the q68/tfidf
    * class — the replacement for a driver-side count()). Output:
    * (bucket, n_base, n_cur, contrib) — exact counts, contrib a
    * 9-dp-rounded double from exact inputs. */
  def psiDrift(base: DataFrame, current: DataFrame, bucketWidth: Int = 200,
               lenCol: String = "n_chars"): DataFrame =
    psiFromHists(lengthHist(base, bucketWidth, lenCol),
      lengthHist(current, bucketWidth, lenCol))

  /** Token-DISTRIBUTION drift between two corpus slices — the
    * vocabulary-level alarm [[psiDrift]]'s length histogram cannot
    * ring (a topic/language shift can leave lengths identical): each
    * side's token stream hashes into `buckets` md5 buckets (the DSIR
    * bucketing) and the same Laplace-smoothed PSI formula compares
    * the two distributions. Output per bucket (bucket, n_base, n_cur,
    * contrib) — aggregate `sum(contrib)` for the headline PSI.
    *
    * Shape at scale: identical to [[psiDrift]] — two map-side-combined
    * B-row histograms, 1-row totals broadcast back. */
  def tokenDrift(base: DataFrame, current: DataFrame, buckets: Int = 256,
                 textCol: String = "text"): DataFrame =
    psiFromHists(tokenHist(base, buckets, textCol),
      tokenHist(current, buckets, textCol))

  /** Per-source KL divergence from the corpus token distribution —
    * the source-distinctiveness ranking ([[tokenDrift]]'s one-vs-all
    * form): each source's hashed-token-bucket distribution against
    * the whole corpus's, `KL(source ‖ corpus)` with Laplace smoothing
    * over the corpus's OBSERVED buckets. High KL = a topical/
    * language outlier worth a curation look; near 0 = the source
    * restates the corpus mixture. Per-bucket contributions are
    * 9-dp-rounded once and DECIMAL-summed, so the per-source number
    * is exact and engine-identical. Output (source, n_tokens, kl).
    *
    * Scale shape: one corpus scan into the (source, bucket) histogram
    * (map-side combined, ≤ \|S\|·B rows); the corpus totals and the
    * source × observed-bucket completion are model-sized joins. */
  def sourceDivergence(docs: DataFrame, buckets: Int = 256,
                       sourceCol: String = "source",
                       textCol: String = "text"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val sb = docs.select(col(sourceCol).as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .select(col("source"),
        pmod(Dedup.hash16(col("__t")), lit(buckets.toLong)).as("bucket"))
      .groupBy(col("source"), col("bucket")).agg(count(lit(1)).as("n"))
      // lazy: feeds totals, the corpus hist, and scoring
      .localCheckpoint(eager = false)
    val corpusHist = sb.groupBy(col("bucket")).agg(sum(col("n")).as("nc"))
    val srcTot = sb.groupBy(col("source")).agg(sum(col("n")).as("tot_s"))
    val bCount = corpusHist.agg(count(lit(1)).as("B"),
      sum(col("nc")).as("tot_c")).withColumn("__k", lit(1))
    // complete each source over every OBSERVED corpus bucket (zeros
    // smoothed), a model-sized |S|·B cross on a constant key
    val grid = srcTot.withColumn("__k", lit(1))
      .join(corpusHist.withColumn("__k", lit(1)), Seq("__k"))
      .join(broadcast(bCount), Seq("__k"))
      .join(sb, Seq("source", "bucket"), "left")
      .select(col("source"), col("tot_s"),
        coalesce(col("n"), lit(0L)).as("n"), col("nc"), col("B"), col("tot_c"))
    val ps = (col("n") + 1).cast("double") / (col("tot_s") + col("B"))
    val pc = (col("nc") + 1).cast("double") / (col("tot_c") + col("B"))
    grid.select(col("source"), col("tot_s"),
        round(ps * round(log(ps / pc), 9), 9).cast("decimal(18,9)").as("__c"))
      .groupBy(col("source"))
      .agg(min(col("tot_s")).as("n_tokens"),
        sum(col("__c")).cast("double").as("kl"))
  }

  /** The hashed-token-bucket histogram [[tokenDrift]] compares —
    * exposed (like [[lengthHist]]) so a monitoring loop can PERSIST
    * it and merge batches by addition. Output: (bucket, n). */
  def tokenHist(df: DataFrame, buckets: Int = 256,
                textCol: String = "text"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .select(pmod(Dedup.hash16(col("__t")), lit(buckets.toLong)).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
  }

  /** The equi-width length histogram [[psiDrift]] compares — exposed
    * so a monitoring loop can PERSIST it and merge batches by addition
    * (counts are associative longs), making per-batch drift O(batch)
    * instead of re-scanning the accumulated corpus. Output:
    * (bucket, n). */
  def lengthHist(df: DataFrame, bucketWidth: Int = 200,
                 lenCol: String = "n_chars"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    df.select(floor(col(lenCol) / bucketWidth.toDouble).cast("long").as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
  }

  /** [[psiDrift]] over two prebuilt `(bucket, n)` histograms. */
  def psiFromHists(baseHist: DataFrame, currentHist: DataFrame): DataFrame = {
    val h = baseHist.select(col("bucket"), col("n").as("n_base"))
      .join(currentHist.select(col("bucket"), col("n").as("n_cur")),
        Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tot = h.agg(sum(col("n_base")).as("__tb"), sum(col("n_cur")).as("__tc"),
      count(lit(1)).as("__nb"))
    val p = (col("n_base") + 1).cast("double") / (col("__tb") + col("__nb"))
    val q = (col("n_cur") + 1).cast("double") / (col("__tc") + col("__nb"))
    h.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_base"), col("n_cur"),
        // the repo's ln recipe: the transcendental is rounded once to
        // 9 dp (cross-engine ln agrees within 1 ulp; everything else
        // here is correctly-rounded double arithmetic on exact inputs)
        round((p - q) * round(log(p / q), 9), 9).as("contrib"))
  }

  /** Waterfilling per-source token caps: given a total token budget,
    * find the single cap `c` with `Σ_s min(n_s, c) ≤ budget` maximal —
    * small sources keep everything, the largest sources are cut to the
    * same ceiling (the per-source cap rule behind C4/RefinedWeb-style
    * "no source dominates" curation, made budget-exact). Allocation is
    * `min(n_s, c)`; when the budget covers the corpus every source
    * keeps its full count.
    *
    * Exact integer algorithm, no driver loop: sort sources by count
    * ascending over the MODEL-SIZED per-source table, prefix-sum; at
    * the first position where `prefix_{i−1} + (S−i+1)·n_i ≥ budget`
    * the cap binds: `c = floor((budget − prefix_{i−1}) / (S−i+1))`.
    * All windows run over ≤ |sources| rows; the 1-row cap (NULL when
    * the budget covers the corpus) is broadcast back — the q68 class.
    * Output: (groupCol, n_tokens, alloc), Σ alloc ≤ budget, exact
    * longs (the one double division is exact below 2⁵³ tokens). */
  def sourceCaps(docs: DataFrame, budgetTokens: Long,
                 groupCol: String = "source", textCol: String = "text"): DataFrame = {
    require(budgetTokens >= 0, "budget must be non-negative")
    val perSource = docs
      .select(col(groupCol), size(TextAnalysis.tokens(col(textCol))).cast("long").as("__n"))
      .groupBy(col(groupCol)).agg(sum(col("__n")).as("n_tokens"))
    val w = Window.orderBy(col("n_tokens"), col(groupCol))
    val ranked = perSource
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__prefix", sum(col("n_tokens")).over(w))
    val sTot = ranked
      .agg(max(col("__i")).as("__S"))
    val cap = ranked.crossJoin(broadcast(sTot))
      // cap binds at the first i where even giving every remaining
      // source n_i overshoots the budget
      .filter(col("__prefix") - col("n_tokens")
        + (col("__S") - col("__i") + 1) * col("n_tokens") >= budgetTokens)
      // 1-row aggregate even when nothing binds (min_by of the empty
      // set is NULL → every source keeps its full count below)
      .agg(min_by(
        floor((lit(budgetTokens) - (col("__prefix") - col("n_tokens")))
          / (col("__S") - col("__i") + 1)).cast("long"),
        col("__i")).as("__cap"))
    ranked.crossJoin(broadcast(cap))
      .select(col(groupCol), col("n_tokens"),
        least(col("n_tokens"), coalesce(col("__cap"), col("n_tokens"))).as("alloc"))
  }

  /** PMI collocation mining (the word2vec phrase-detection statistic,
    * Mikolov et al. 2013 §4): for every adjacent token pair,
    * `pmi = ln(c12·N / (c1·c2))` over the corpus token stream —
    * high-PMI pairs ("new york") are phrases worth fusing into single
    * tokens before embedding/tokenizer training. `minCount` suppresses
    * the noise floor (rare pairs have wildly inflated PMI); the top-N
    * cut is `TakeOrderedAndProject`, never a global sort.
    *
    * Shape at scale: one bigram aggregation (occurrence stream,
    * map-side combine) + one vocab-sized unigram aggregation; the
    * unigram joins are model-sized, N is the 1-row broadcast total
    * (q68 class). PMI is assembled in double from exact counts in a
    * fixed association, ln rounded once to 9 dp. Output:
    * (t1, t2, c12, pmi), top-N by (pmi desc, pair asc). */
  def collocations(docs: DataFrame, minCount: Long = 5, topN: Int = 50,
                   textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // one corpus-wide pass: the unigram aggregate; N is its column sum
    // (a vocab-sized aggregation, never a second scan or a
    // materialized occurrence stream)
    val uni = docs.select(explode(toks).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val nTot = uni.agg(sum(col("__c")).as("__N"))
    val pairs = docs
      .select(explode(graft.functions.TokenNgrams(toks, 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
      .select(substring_index(col("bg"), " ", 1).as("t1"),
        substring_index(col("bg"), " ", -1).as("t2"), col("c12"))
    pairs
      .join(uni.select(col("__t").as("t1"), col("__c").as("__c1")), Seq("t1"))
      .join(uni.select(col("__t").as("t2"), col("__c").as("__c2")), Seq("t2"))
      .crossJoin(broadcast(nTot))
      .select(col("t1"), col("t2"), col("c12"),
        round(log((col("c12").cast("double") * col("__N"))
          / (col("__c1").cast("double") * col("__c2"))), 9).as("pmi"))
      .orderBy(col("pmi").desc, col("t1").asc, col("t2").asc)
      .limit(topN)
  }

  /** Per-source score calibration via histogram-CDF quantile
    * normalization: map each document's raw score to its mid-rank
    * quantile WITHIN ITS SOURCE — `(below + c/2) / n` over a
    * fixed-bucket histogram. The fix for the classic curation bug
    * where one global threshold over a heterogeneous corpus keeps
    * everything from a lenient-scoring source and nothing from a
    * strict one: after calibration, "top 20% of every source" is the
    * same predicate everywhere.
    *
    * Scores are assumed in [0, 1] (the [[TextAnalysis.qualityScore]]
    * contract); buckets are `min(floor(s·B), B−1)`. Shape at scale:
    * one histogram aggregation to a (sources × B)-row table, windows
    * over THAT (never the corpus), and a broadcast join back on
    * (source, bucket) — the corpus is touched by exactly one shuffle.
    * Calibration resolution is 1/B within a bucket (mid-rank); exact
    * integer counts make the quantile deterministic cross-engine.
    * Output: (idCol, groupCol, scoreCol, calibrated). */
  def calibrateScores(scored: DataFrame, scoreCol: String,
                      groupCol: String = "source", nBuckets: Int = 100,
                      idCol: String = "doc_id"): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val b = least(floor(col(scoreCol) * nBuckets).cast("long"), lit(nBuckets - 1L))
    val withB = scored.select(col(idCol), col(groupCol), col(scoreCol), b.as("__b"))
    val hist = withB.groupBy(col(groupCol), col("__b")).agg(count(lit(1)).as("__c"))
    val cdf = hist
      .withColumn("__below",
        sum(col("__c")).over(Window.partitionBy(col(groupCol)).orderBy(col("__b")))
          - col("__c"))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(col(groupCol))))
    withB.join(broadcast(cdf), Seq(groupCol, "__b"))
      .select(col(idCol), col(groupCol), col(scoreCol),
        ((col("__below") + lit(0.5) * col("__c")) / col("__n")).as("calibrated"))
  }

  /** Apply ONE BPE merge (l, r) → l+r to a symbol-array column:
    * greedy left-to-right, non-overlapping — the canonical
    * merge-application rule (a left fold whose freshly merged symbol
    * `l+r` can never re-match as `l`, so the fold IS the
    * position-scan). */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** Initial BPE symbol string of a word: the word itself
    * (char-grain), or its GPT-2 byte-level unicode form — every
    * UTF-8 byte as one visible char, [[graft.functions.Gpt2Bytes]] —
    * so merges operate at byte grain and arbitrary UTF-8 round-trips
    * losslessly through the learned pieces. */
  private def bpeInitString(word: Column, byteLevel: Boolean): Column =
    if (byteLevel) graft.functions.Gpt2Bytes.mapCol(word) else word

  /** The GPT-2 pre-tokenizer pattern (the public encoder.py regex):
    * contraction suffixes, optionally-space-prefixed letter / number /
    * punctuation runs, then whitespace — `\s+(?!\S)` keeps a trailing
    * whitespace run whole while interior runs leave their LAST space
    * to prefix the following word. Java-regex semantics: `\p{L}` and
    * `\p{N}` are the Unicode classes (as in the reference), `\s` is
    * ASCII whitespace (the reference's `\s` is Unicode — NBSP-class
    * whitespace diverges; documented, irrelevant to merge statistics
    * on real text). */
  val Gpt2PretokenPattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+" +
      "|\\s+(?!\\S)|\\s+"

  /** GPT-2 pre-tokenization: text → production segmentation pieces
    * (spaces ATTACHED to the following word — the property that makes
    * byte-level BPE merge statistics match the shipped tokenizer).
    * Zero-shuffle scan (one codegen'd `regexp_extract_all`). */
  def gpt2Pieces(text: Column): Column =
    regexp_extract_all(text, lit(Gpt2PretokenPattern), lit(0))

  /** Token grain ahead of BPE: GPT-2 regex pieces or whitespace. */
  private def bpeGrain(textCol: String, gpt2Pre: Boolean): Column =
    if (gpt2Pre) gpt2Pieces(col(textCol))
    else TextAnalysis.tokens(col(textCol))

  /** BPE tokenizer training (Sennrich et al. 2016, arXiv:1508.07909):
    * start from per-character symbols, repeatedly merge the
    * highest-frequency adjacent symbol pair (ties broken
    * lexicographically by (left, right) — fully deterministic), and
    * emit the ordered merges table
    * (rank, left_sym, right_sym, pair_count) that [[bpeEncode]] (and
    * any standard BPE tokenizer) replays. Pair frequency counts every
    * adjacent occurrence weighted by word frequency, the reference
    * convention. No end-of-word marker (documented divergence from
    * Sennrich's `</w>`; add one upstream by suffixing tokens if
    * needed). `byteLevel = true` is the GPT-2 production shape:
    * symbols start as the word's UTF-8 BYTES in the byte↔unicode
    * table's visible space, so the alphabet is closed (≤ 256 base
    * symbols) and any input — emoji, CJK, mojibake — segments without
    * unknown tokens.
    *
    * Scale shape: the loop state is the VOCAB table (distinct words ×
    * symbol arrays), never the corpus — the corpus is scanned once to
    * build word frequencies, the same driver-loop-over-DataFrames
    * pattern as `Dedup.connectedComponents`, localCheckpoint cutting
    * lineage per round. Per round: one narrow pair explode + one
    * vocab-sized aggregation, then a 1-ROW driver action (the argmax
    * pair — the same bounded action class as the CC convergence
    * count). Stops early when no adjacent pairs remain. */
  def bpeTrain(docs: DataFrame, numMerges: Int,
               textCol: String = "text",
               byteLevel: Boolean = false,
               gpt2Pre: Boolean = false): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // LAZY cuts throughout the loop: each table materializes inside
    // the job that first consumes it (the round's pair aggregation)
    // instead of as its own eager checkpoint job — same single
    // evaluation, one less scheduler job per round
    var words = docs
      .select(explode(bpeGrain(textCol, gpt2Pre)).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        split(bpeInitString(col("word"), byteLevel), "").as("syms"))
      .localCheckpoint(eager = false)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var exhausted = false
    var k = 0
    while (k < numMerges && !exhausted) {
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(1), size(col("syms")) - 1), i =>
            struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = top.head
        k += 1
        merges += ((k.toLong, l, r, cnt))
        words = words
          .withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(eager = false)
      }
    }
    merges.result().toDF("rank", "left_sym", "right_sym", "pair_count")
  }

  /** WordPiece merge with `##` continuation marks: the merged symbol
    * is the left piece plus the right piece minus its mark (`a` +
    * `##b` → `ab`, `##a` + `##b` → `##ab`). */
  private def applyWpMerge(syms: Column, l: String, r: String,
                           merged: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(s))))

  /** Initial WordPiece symbols of a word: first codepoint plain,
    * every later codepoint `##`-marked. */
  private def wpInitSyms(word: Column): Column =
    transform(split(word, ""), (c, i) =>
      when(i === 0, c).otherwise(concat(lit("##"), c)))

  /** Join two WordPiece symbols: the right piece sheds its `##` mark
    * (only when it really is a mark — a bare `##` symbol is a
    * word-START piece, the len>2 rule the vocabulary index and the
    * oracle share). */
  private def wpJoin(l: String, r: String): String =
    l + (if (r.length > 2 && r.startsWith("##")) r.substring(2) else r)

  /** WordPiece tokenizer training (Wu et al. 2016, arXiv:1609.08144;
    * Schuster & Nakajima 2012) — BPE's likelihood-scored sibling:
    * start from `##`-marked per-character symbols (first char plain,
    * the rest continuation-marked) and repeatedly merge the adjacent
    * pair maximizing `count(l,r) / (count(l) · count(r))` — the pair
    * whose merge most increases a unigram LM's corpus likelihood —
    * instead of BPE's raw pair count. Ties break lexicographically by
    * (left, right). Emits (rank, left_sym, right_sym, pair_count,
    * score); the vocabulary [[wordpieceEncode]] consumes is the
    * initial alphabet plus each merge's joined symbol.
    *
    * The score is ENGINE-EXACT as a double: both operands are exact
    * int64 counts (the product stays well under 2^53 at any corpus
    * this loop's vocab table fits), and IEEE division is correctly
    * rounded — so the argmax, unlike a summed-float score, is
    * bit-reproducible across engines.
    *
    * Scale shape: [[bpeTrain]]'s exactly — the loop state is the
    * DISTINCT-WORD table, the corpus is scanned once; per round one
    * pair explode + one symbol explode (both vocab-sized aggregations)
    * and a 1-ROW driver argmax. */
  def wordpieceTrain(docs: DataFrame, numMerges: Int,
                     textCol: String = "text"): DataFrame =
    wpTrainOnWords(wpWordTable(docs, textCol), numMerges)

  /** The trainer's loop state: the DISTINCT-word table with
    * frequencies and initial `##`-marked symbols — ONE corpus scan,
    * shared by [[wordpieceTrain]] and [[wordpieceTrainAndVocab]]. */
  private def wpWordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"), wpInitSyms(col("word")).as("syms"))
      .localCheckpoint(eager = false)

  private def wpTrainOnWords(words0: DataFrame, numMerges: Int): DataFrame = {
    val spark = words0.sparkSession
    import spark.implicits._
    var words = words0
    val merges = Seq.newBuilder[(Long, String, String, Long, Double)]
    var exhausted = false
    var k = 0
    while (k < numMerges && !exhausted) {
      // the symbol-count table is MODEL-SIZED by construction (at most
      // the alphabet plus the merges so far) — one bounded collect per
      // round, then the pair scoring reads the denominators from a
      // LITERAL MAP instead of re-joining a re-aggregated symbol table
      // twice. Same exact longs into the same long product and IEEE
      // division, and the (score DESC, l, r) argmax stays Spark-side —
      // round winners are bit-identical; per round this drops two
      // joins and their AQE sub-jobs (q186 was 44 scheduler jobs for
      // 8 merges, nearly all driver dispatch).
      val symRows = words
        .select(col("freq"), explode(col("syms")).as("s"))
        .groupBy(col("s")).agg(sum(col("freq")).as("c"))
        .as[(String, Long)]
        .collect()
      val symLit = map(symRows.toIndexedSeq.flatMap {
        case (s, c) => Seq(lit(s), lit(c)) }: _*)
      val top = words
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(
          transform(sequence(lit(1), size(col("syms")) - 1), i =>
            struct(element_at(col("syms"), i).as("l"),
              element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .select(col("l"), col("r"), col("cnt"),
          (col("cnt").cast("double")
            / (element_at(symLit, col("l")) * element_at(symLit, col("r")))
              .cast("double")).as("score"))
        .orderBy(col("score").desc, col("l").asc, col("r").asc)
        .limit(1)
        .as[(String, String, Long, Double)]
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt, score) = top.head
        k += 1
        merges += ((k.toLong, l, r, cnt, score))
        // LAZY cut: the rewritten table materializes inside the next
        // round's symbol-count job instead of as its own eager job
        words = words
          .withColumn("syms", applyWpMerge(col("syms"), l, r, wpJoin(l, r)))
          .localCheckpoint(eager = false)
      }
    }
    merges.result().toDF("rank", "left_sym", "right_sym", "pair_count", "score")
  }

  /** The model-sized WordPiece vocabulary a trained merge list
    * implies: the corpus's initial alphabet (first chars plain,
    * continuation chars `##`-marked) plus each merge's joined symbol.
    * One bounded driver collect (alphabet + merges — the q113 merges
    * class), so callers can hand [[wordpieceEncode]] a plain Seq. */
  def wordpieceVocab(docs: DataFrame,
                     merges: Seq[(String, String)],
                     textCol: String = "text"): Seq[String] = {
    val alphabet = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .select(explode(wpInitSyms(col("word"))).as("s"))
      .distinct().collect().map(_.getString(0))
    (alphabet.toSeq ++ merges.map { case (l, r) => wpJoin(l, r) }).distinct
  }

  /** Train the merges AND derive the encode vocabulary from ONE
    * corpus scan: the alphabet is the distinct initial symbols of the
    * distinct-word table the trainer already built — the identical
    * set [[wordpieceVocab]] re-derives from a second token-stream
    * scan when no trained word table is at hand (distinct symbols
    * over distinct words ≡ distinct symbols over all token
    * instances; [[WordpieceSegment]] indexes the vocab into hash
    * sets, so order is immaterial). Returns ([[wordpieceTrain]]'s
    * merge rows verbatim, the vocabulary [[wordpieceEncode]] takes) —
    * the train→encode composition pays one corpus pass, not two. */
  def wordpieceTrainAndVocab(docs: DataFrame, numMerges: Int,
                             textCol: String = "text"): (DataFrame, Seq[String]) = {
    val words = wpWordTable(docs, textCol)
    val mergesDf = wpTrainOnWords(words, numMerges)
    // mergesDf is a driver-local table (the trainer's builder Seq)
    val mergePairs = mergesDf.collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val alphabet = words.select(explode(col("syms")).as("s"))
      .distinct().collect().map(_.getString(0))
    (mergesDf,
      (alphabet.toSeq ++ mergePairs.map { case (l, r) => wpJoin(l, r) }).distinct)
  }

  /** Encode a corpus with a WordPiece VOCABULARY ([[wordpieceVocab]]
    * from [[wordpieceTrain]]'s merges, or any published vocab file):
    * greedy longest-match-first, `##` continuation pieces, whole-word
    * `unk` on a miss — BERT's inference rule, deliberately DIFFERENT
    * from replaying the training merges (train-time segmentation and
    * max-match disagree on real corpora; this is the shipped
    * behavior). Same output contract as [[bpeEncode]]:
    * (idCol, pos, piece_idx, piece).
    *
    * Scale shape: the vocab is a reference object inside ONE native
    * codegen'd expression ([[graft.functions.WordpieceSegment]]) —
    * no per-merge column rewrites, no joins against a vocab table;
    * the distinct-word table is segmented in a single narrow pass and
    * the token stream joined once. */
  def wordpieceEncode(docs: DataFrame, vocab: Seq[String],
                      idCol: String = "doc_id", textCol: String = "text",
                      unk: String = "[UNK]"): DataFrame = {
    val toks = docs.select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos0", "word")))
      .select(col(idCol), (col("pos0") + 1).cast("long").as("pos"), col("word"))
    val words = toks.select("word").distinct()
      .withColumn("syms",
        graft.functions.WordpieceSegment(col("word"), vocab, unk))
    toks.join(words, Seq("word"))
      .select(col(idCol), col("pos"),
        posexplode(col("syms")).as(Seq("pidx", "piece")))
      .select(col(idCol), col("pos"),
        (col("pidx") + 1).cast("long").as("piece_idx"), col("piece"))
  }

  /** Encode a corpus with a LEARNED merges list ([[bpeTrain]] output,
    * rank order): `encodeTokens`' learned-merges mode. The merges
    * replay on the DISTINCT-word table (vocab-sized loop state, one
    * column rewrite per merge, lineage cut every `checkpointEvery`
    * rounds), then the token stream joins the word → pieces map once —
    * the 100 TB corpus is scanned once and never re-segmented per
    * merge. The cut cadence is a measured cliff, not just plan
    * hygiene: `aggregate` HOF rewrites stacked past ~4 deep evaluate
    * interpreted with the whole child chain re-run per level (8 deep
    * measured 20× slower than materializing every 4), so keep
    * `checkpointEvery` small. Returns
    * (idCol, pos, piece_idx, piece): token `pos` split into its BPE
    * pieces in order. */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)],
                idCol: String = "doc_id", textCol: String = "text",
                checkpointEvery: Int = 4,
                byteLevel: Boolean = false,
                gpt2Pre: Boolean = false): DataFrame = {
    val toks = docs.select(col(idCol),
        posexplode(bpeGrain(textCol, gpt2Pre)).as(Seq("pos0", "word")))
      .select(col(idCol), (col("pos0") + 1).cast("long").as("pos"), col("word"))
    var words = toks.select("word").distinct()
      .withColumn("syms", split(bpeInitString(col("word"), byteLevel), ""))
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      words = words.withColumn("syms", applyMerge(col("syms"), l, r))
      // LAZY cut: the plan/RDD boundary (what bounds the stacked-HOF
      // depth) exists immediately; the blocks simply materialize
      // inside the final join's job instead of one eager job per cut
      if ((i + 1) % checkpointEvery == 0)
        words = words.localCheckpoint(eager = false)
    }
    toks.join(words, Seq("word"))
      .select(col(idCol), col("pos"),
        posexplode(col("syms")).as(Seq("pidx", "piece")))
      .select(col(idCol), col("pos"), (col("pidx") + 1).cast("long").as("piece_idx"),
        col("piece"))
  }

  /** Data-constrained epoch/repetition schedule — [[mixtureSample]]'s
    * UPSAMPLING sibling (Muennighoff et al. 2023, "Scaling
    * data-constrained language models"): mixture weights may demand
    * MORE tokens from a source than it has, so each source runs
    * `eps = weight·budget/tokens_s` epochs — every document repeats
    * `floor(eps)` times, and the fractional epoch admits documents by
    * the same deterministic 8-bit md5 threshold [[mixtureSample]]
    * uses (1/256 resolution, RNG-free, engine-exact integer compare).
    * Output one row per (document, epoch): (idCol, source, n_tokens,
    * epoch) — the expanded training sequence a repeated-data run
    * actually consumes, reproducible bit-for-bit.
    *
    * Scale shape: per-source totals are a model-sized aggregate
    * broadcast back; the repeat expansion is a narrow per-row
    * `sequence` explode — no shuffle beyond the totals group-by. */
  def epochSchedule(docs: DataFrame, weights: Map[String, Double],
                    budgetTokens: Long, defaultWeight: Double = 0.0,
                    idCol: String = "doc_id", textCol: String = "text",
                    sourceCol: String = "source"): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be > 0, got $budgetTokens")
    val perDoc = docs.select(col(idCol), col(sourceCol).as("source"),
      size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
    val wCol = weights.toSeq.sortBy(_._1).foldLeft(lit(defaultWeight)) {
      case (acc, (s, w)) => when(col("source") === s, lit(w)).otherwise(acc)
    }
    val sched = perDoc.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("tok_s"))
      .select(col("source"),
        (wCol * budgetTokens.toDouble / col("tok_s")).as("__eps"))
      .select(col("source"),
        floor(col("__eps")).cast("long").as("__full"),
        floor((col("__eps") - floor(col("__eps"))) * 256).cast("long").as("__thr"))
    val hx = md5(concat(lit("epoch|"), col("source"), lit("|"), col(idCol).cast("string")))
    def nibAt(i: Int) = instr(lit("0123456789abcdef"), substring(hx, i, 1)) - 1
    perDoc.join(broadcast(sched), "source")
      .withColumn("__ne", col("__full") +
        when(nibAt(1) * 16 + nibAt(2) < col("__thr"), 1L).otherwise(0L))
      .filter(col("__ne") >= 1)
      .select(col(idCol), col("source"), col("n_tokens"),
        explode(sequence(lit(1L), col("__ne"))).as("epoch"))
  }

  /** Tokenizer fertility audit — pieces per word by source, under a
    * LEARNED merges list ([[bpeTrain]] output): the tokenizer-fairness
    * measurement (Petrov et al. 2023) — a tokenizer that fragments one
    * source/language inflates its training cost and shrinks its
    * effective context relative to the others. Output per source:
    * (source, n_words, n_pieces, n_chars, fertility = pieces/word).
    *
    * Scale shape: [[bpeEncode]] replays the merges on the
    * DISTINCT-WORD table and joins the token stream once; the roll-up
    * here collapses map-side to one row per source. */
  def tokenizerFertility(docs: DataFrame, merges: Seq[(String, String)],
                         idCol: String = "doc_id", textCol: String = "text",
                         sourceCol: String = "source"): DataFrame =
    bpeEncode(docs, merges, idCol, textCol)
      .join(docs.select(col(idCol), col(sourceCol)), Seq(idCol))
      .groupBy(col(sourceCol))
      .agg(sum(when(col("piece_idx") === 1, 1L).otherwise(0L)).as("n_words"),
        count(lit(1)).as("n_pieces"),
        sum(length(col("piece"))).cast("long").as("n_chars"))
      .withColumn("fertility", col("n_pieces").cast("double") / col("n_words"))

  /** Deterministic global training-order shuffle — the shard writer:
    * every document gets a shard (md5-uniform over `nShards`) and a
    * position within it (rank of an independent md5 priority; ties
    * impossible short of an md5 collision, broken by id anyway).
    * RNG-free — the permutation is a pure function of document ids,
    * identical on any cluster, partitioning, or rerun, so a training
    * run's data order is reproducible and resumable by (shard, pos).
    *
    * Scale shape: the per-shard rank IS the shard writer's
    * sort-within-partition — md5 uniformity bounds every shard at
    * ~corpus/nShards rows, so pick `nShards` so a shard fits a write
    * task (the same sizing rule as any sharded materialization; there
    * is no global sort). */
  def shuffleShards(docs: DataFrame, nShards: Int,
                    idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val idStr = col(idCol).cast("string")
    val keyed = docs.select(col(idCol),
      pmod(Dedup.hash16(concat(lit("shard|"), idStr)), lit(nShards.toLong)).as("shard"),
      md5(concat(lit("shuffle|"), idStr)).as("__pri"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__pri"), col(idCol))
    keyed.withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Seed vocabulary for a UNIGRAM-LM tokenizer (Kudo 2018,
    * SentencePiece's model family — the other production tokenizer
    * next to [[bpeTrain]]'s BPE): all corpus substrings up to
    * `maxPieceLen` chars are candidate pieces; every single character
    * is kept unconditionally (the coverage floor Viterbi needs), plus
    * the `vocabSize` most frequent multi-char pieces (ties
    * lexicographic). Piece log-probs are `round(ln(freq/total), 9)`
    * over the KEPT vocab, carried as DECIMAL(28,9) — the suite-wide
    * final-decimal contract — so downstream path sums are exact and
    * engine-identical, the same ln recipe as DSIR/PSI.
    *
    * Contract brittleness note: the (freq DESC, piece ASC) tie rule
    * decides which pieces cross the `vocabSize` boundary, and on the
    * sf0.01 fixture the boundary sits inside a 4-way freq tie
    * ('jo'/'joi'/'join'/'oin' at freq=964) — the kept set, the total,
    * and therefore EVERY logp flip if the fixture or tie rule
    * changes. Keep the oracle's ORDER BY freq DESC, piece LIMIT in
    * lock-step with this clause, and prefer widening `vocabSize` away
    * from a tie when designing new contracts over this output.
    *
    * Scale shape: substring expansion runs on the DISTINCT-WORD table
    * (vocab-sized), weighted by corpus word frequency — the corpus is
    * scanned once for the word counts; the top-N is a bounded
    * TakeOrdered. Returns (piece, freq, logp). */
  def unigramSeedVocab(docs: DataFrame, maxPieceLen: Int = 4,
                       vocabSize: Int = 20,
                       textCol: String = "text"): DataFrame = {
    require(maxPieceLen >= 1 && vocabSize >= 0,
      s"need maxPieceLen >= 1 (got $maxPieceLen), vocabSize >= 0 (got $vocabSize)")
    val words = docs.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val w = col("word")
    val pieces = words.select(col("freq"), explode(flatten(
        transform(sequence(lit(1), length(w)), i =>
          transform(sequence(lit(1), least(lit(maxPieceLen), length(w) - i + 1)),
            l => w.substr(i, l))))).as("piece"))
      .groupBy("piece").agg(sum(col("freq")).as("freq"))
      // lazy: feeds both the char floor and the top-N
      .localCheckpoint(eager = false)
    val kept = pieces.filter(length(col("piece")) === 1)
      .unionByName(pieces.filter(length(col("piece")) > 1)
        .orderBy(col("freq").desc, col("piece").asc).limit(vocabSize))
    val total = kept.agg(sum(col("freq")).as("__t"))
    // logp is rounded through exact DECIMAL, then emitted as DOUBLE —
    // hashed contracts carry no decimal columns (driver-hash rule);
    // consumers ([[unigramSegment]], [[unigramPrune]]) re-cast to
    // decimal(28,9) on entry, an exact round-trip at <= 15 sig digits.
    kept.join(broadcast(total))
      .select(col("piece"), col("freq"),
        round(log(col("freq").cast("double") / col("__t")), 9)
          .cast("decimal(28,9)").cast("double").as("logp"))
  }

  /** Viterbi segmentation of the corpus under a unigram piece LM
    * ([[unigramSeedVocab]] output) — SentencePiece's inference step:
    * each token splits into the vocab pieces maximizing the summed
    * piece log-prob. Path scores are exact DECIMAL sums of the 9-dp
    * logs (order-free, engine-identical); exact ties prefer the
    * segmentation whose LAST piece is longest at each boundary (the
    * min start index), so the result is fully deterministic. Every
    * character of the corpus must be in the vocab — true by
    * construction for a vocab seeded from the same corpus.
    *
    * Scale shape: the DP runs once per DISTINCT word (vocab-sized
    * state — [[bpeEncode]]'s contract), candidates per word bounded
    * by len·maxPieceLen, the whole DP a single depth-1 `aggregate`
    * over positions; the token stream then joins the word → pieces
    * map once. Returns (idCol, pos, piece_idx, piece). */
  def unigramSegment(docs: DataFrame, vocab: DataFrame, maxPieceLen: Int = 4,
                     idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dec = "decimal(28,9)"
    val toks = docs.select(col(idCol),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos0", "word")))
      .select(col(idCol), (col("pos0") + 1).cast("long").as("pos"), col("word"))
    val w = col("word")
    // candidate pieces per distinct word: (i 0-based start, j end, logp)
    val cands = toks.select("word").distinct()
      .select(w, explode(flatten(
        transform(sequence(lit(1), length(w)), s =>
          transform(sequence(lit(1), least(lit(maxPieceLen), length(w) - s + 1)),
            l => struct((s - 1).as("i"), (s - 1 + l).as("j"),
              w.substr(s, l).as("piece")))))).as("c"))
      .select(w, col("c.i").as("i"), col("c.j").as("j"), col("c.piece").as("piece"))
      .join(vocab.select(col("piece"), col("logp")), "piece")
    val byWord = cands
      .groupBy("word")
      .agg(collect_list(struct(col("i"), col("j"),
        col("logp").cast(dec).as("logp"))).as("__cands"))
    // Viterbi: state = dp[0..p] as array of (best, from); step j picks
    // the max (score, then min start) over candidates ending at j
    val dp = aggregate(
      sequence(lit(1), length(w)),
      array(struct(lit(BigDecimal(0)).cast(dec).as("best"), lit(-1).as("from"))),
      (acc: Column, j: Column) => {
        val scored = transform(
          filter(col("__cands"), c => c.getField("j") === j),
          c => struct(
            (element_at(acc, c.getField("i") + 1).getField("best")
              + c.getField("logp")).cast(dec).as("best"),
            (-c.getField("i")).as("negi")))
        val pick = array_max(scored)
        concat(acc, array(struct(pick.getField("best").as("best"),
          (-pick.getField("negi")).as("from"))))
      })
    // backtrace: walk from[] from n to 0, prepending each boundary
    val bounds = aggregate(
      sequence(lit(1), length(w)),
      array(length(w)),
      (acc: Column, _: Column) =>
        when(element_at(acc, 1) > 0,
          concat(array(element_at(col("__dp"), element_at(acc, 1) + 1)
            .getField("from")), acc))
          .otherwise(acc))
    // fail-fast on coverage gaps: a word no vocab-piece combination
    // can span (possible under a pruned vocab — unigramTrain drops
    // unused single chars) leaves a NULL final DP score; without the
    // guard it would emit null pieces — silent corruption downstream.
    // The guard lives inside piece_idx (always consumed) so the
    // optimizer cannot prune it, kthSmallestByKey's pattern.
    val guard = when(
      element_at(col("__dp"), size(col("__dp"))).getField("best").isNull,
      raise_error(concat(
        lit("unigramSegment: vocab cannot cover word '"), w,
        lit("' — unigramSeedVocab keeps every corpus character, but a " +
          "pruned/foreign vocab may not; extend it or drop the word upstream")))
        .cast("int")).otherwise(lit(1))
    val segmented = byWord
      .withColumn("__dp", dp)
      .withColumn("__bounds", bounds)
      .select(w, col("__dp"), posexplode(transform(
        sequence(lit(1), size(col("__bounds")) - 1),
        k => w.substr(element_at(col("__bounds"), k) + 1,
          element_at(col("__bounds"), k + 1) - element_at(col("__bounds"), k))))
        .as(Seq("pidx", "piece")))
      .select(w, (col("pidx") + guard).cast("long").as("piece_idx"), col("piece"))
    toks.join(segmented, Seq("word"))
      .select(col(idCol), col("pos"), col("piece_idx"), col("piece"))
  }

  /** Apply a TRAINED unigram vocab to a corpus — the inference twin of
    * [[bpeEncode]] for the other tokenizer family: Viterbi-segment
    * ([[unigramSegment]]) and map every piece to its dense id, ids
    * assigned by piece ASC so any engine or run derives the same
    * mapping from the same vocab (no dictionary file needed). The id
    * window runs on the MODEL-sized vocab table (never the corpus);
    * the piece→id map then broadcasts into the token stream. Output
    * (idCol, pos, piece_idx, piece_id, piece). */
  def unigramEncode(docs: DataFrame, vocab: DataFrame, maxPieceLen: Int = 4,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ids = vocab.select(col("piece"))
      .withColumn("piece_id",
        row_number().over(Window.orderBy(col("piece"))).cast("long"))
    unigramSegment(docs, vocab, maxPieceLen, idCol, textCol)
      .join(broadcast(ids), Seq("piece"))
      .select(col(idCol), col("pos"), col("piece_idx"),
        col("piece_id"), col("piece"))
  }

  /** Per-source fit under the corpus bigram LM — the domain-mixture
    * signal behind DoReMi-style reweighting: sources whose text the
    * corpus-wide model scores poorly (low average log-prob) are
    * under-represented domains; sources it models too easily are
    * boilerplate-heavy. The model is [[bigramLogProb]]'s MLE bigram
    * table; per-source sums stay exact decimals (order-free), the
    * average is one correctly-rounded double division of exact inputs
    * (the q70 contract). Output
    * (source, n_bigrams, sum_logprob, avg_logprob).
    *
    * Scale shape: the occurrence stream collapses once into the
    * model-sized pair table; the scoring join re-reads the CHECKPOINTED
    * stream, and the final roll-up is |sources| rows. */
  def sourceBigramFit(docs: DataFrame, textCol: String = "text",
                      sourceCol: String = "source"): DataFrame = {
    val bigrams = docs.select(col(sourceCol).as("source"),
        explode(graft.functions.TokenNgrams(TextAnalysis.tokens(col(textCol)), 2))
          .as("bg"))
      // lazy: feeds the model AND the scoring pass
      .localCheckpoint(eager = false)
    val pairCounts = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("c_pair"))
    val model = pairCounts
      .withColumn("c_prefix", sum(col("c_pair"))
        .over(Window.partitionBy(substring_index(col("bg"), " ", 1))))
      .select(col("bg"),
        round(log(col("c_pair").cast("double") / col("c_prefix")), 9)
          .cast("decimal(28,9)").as("logprob"))
    bigrams.join(model, Seq("bg"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("logprob")).as("__sum"))
      .select(col("source"), col("n_bigrams"),
        col("__sum").cast("double").as("sum_logprob"),
        (col("__sum").cast("double") / col("n_bigrams")).as("avg_logprob"))
  }

  /** One EM count re-estimation for the unigram LM (the M-step over
    * [[unigramSegment]]'s Viterbi E-step): piece occurrence counts
    * along the corpus's Viterbi paths, re-normalized into new
    * log-probs — iterate segment → reestimate to convergence and
    * prune the tail to train the vocabulary down, exactly Kudo's
    * loop. Pieces the Viterbi paths never use drop out (their next
    * probability is 0). Returns (piece, freq, logp). */
  def unigramReestimate(docs: DataFrame, vocab: DataFrame, maxPieceLen: Int = 4,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val counts = unigramSegment(docs, vocab, maxPieceLen, idCol, textCol)
      .groupBy("piece").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val total = counts.agg(sum(col("freq")).as("__t"))
    // decimal-rounded then DOUBLE, like [[unigramSeedVocab]] — no
    // decimal column in the hashed contract.
    counts.join(broadcast(total))
      .select(col("piece"), col("freq"),
        round(log(col("freq").cast("double") / col("__t")), 9)
          .cast("decimal(28,9)").cast("double").as("logp"))
  }

  /** DoReMi-flavored domain-mixture budgeting — the operator that
    * CLOSES the loop [[sourceBigramFit]] opens: sources the
    * corpus-wide LM fits worst (lowest average log-prob) are the
    * under-represented domains DoReMi (Xie et al. 2023) upweights, so
    * each source's token budget is proportional to its EXCESS loss
    * over the best-fitting source (+1 so a uniformly-fit corpus
    * degrades to a uniform split instead of 0/0). The excess is the
    * difference of two q166-contract doubles rounded once to 6 dp and
    * scaled to an exact integer weight; budgets are then exact
    * integer `div` shares of `totalBudget` (the epochSchedule/caps
    * recipe) — every output engine-identical. Floor division leaves a
    * deficit < #sources, deliberately unassigned. Pair with
    * [[tokenBudgetSample]] to materialize the per-source draws.
    *
    * Output (source, n_bigrams, avg_logprob, excess_weight,
    * budget_tokens). The `totalBudget · excess_weight` product runs
    * in DECIMAL(38,0) — a 2^40 budget times a worst-case weight
    * (~10^7 at 10 nats excess) tops out near 10^19, which overflows
    * int64 but sits comfortably in 38 digits — then the exact
    * integer `div` brings the share back under `totalBudget`, so
    * `budget_tokens` is always a safe BIGINT.
    *
    * Scale shape: [[sourceBigramFit]]'s two corpus passes, then
    * |sources|-row joins against two broadcast 1-row aggregates. */
  def doremiBudgets(docs: DataFrame, totalBudget: Long,
                    textCol: String = "text",
                    sourceCol: String = "source"): DataFrame = {
    require(totalBudget > 0 && totalBudget <= (1L << 40),
      s"totalBudget must be in (0, 2^40], got $totalBudget")
    val fit = sourceBigramFit(docs, textCol, sourceCol)
    val best = fit.agg(max(col("avg_logprob")).as("__best"))
    val weighted = fit.join(broadcast(best))
      .select(col("source"), col("n_bigrams"), col("avg_logprob"),
        ((round(col("__best") - col("avg_logprob"), 6).cast("decimal(18,6)")
          * lit(1000000L)).cast("long") + 1L).as("excess_weight"))
    val tot = weighted.agg(sum(col("excess_weight")).as("__tw"))
    weighted.join(broadcast(tot))
      .select(col("source"), col("n_bigrams"), col("avg_logprob"),
        col("excess_weight"),
        expr(s"(CAST(${totalBudget} AS DECIMAL(38,0)) * excess_weight) div __tw")
          .as("budget_tokens"))
  }

  /** Likelihood-loss vocabulary pruning — SentencePiece's ACTUAL
    * prune step (Kudo 2018 §3.2), not just drop-unused: each
    * multi-char piece is charged the corpus-likelihood LOSS its
    * removal would cost, `loss(p) = freq(p) · (logp(p) − alt(p))`,
    * where `alt(p)` is the best Viterbi segmentation of p's own
    * string over the REST of the vocab (the full-span candidate —
    * the piece itself — excluded from its DP). Low-loss pieces are
    * those whose spans re-segment almost as well without them; the
    * bottom of the loss ranking is dropped until `targetMulti`
    * multi-char pieces remain. Single-char pieces (the coverage
    * floor) are never dropped; pieces whose string CANNOT re-segment
    * without them (a char fell out of the vocab) are essential and
    * rank above every finite loss. Ties (loss, then piece ASC) and
    * all arithmetic are exact decimals, so the kept set is
    * engine-identical. Log-probs re-normalize over the kept total
    * (the [[unigramSeedVocab]] recipe). Returns (piece, freq, logp).
    *
    * Scale shape: the DP runs once per VOCAB piece (model-sized, the
    * [[unigramSegment]] per-distinct-word contract), the ranking is a
    * bounded TakeOrdered — the corpus is never touched. */
  def unigramPrune(vocab: DataFrame, targetMulti: Int,
                   maxPieceLen: Int = 4): DataFrame = {
    require(targetMulti >= 0, s"targetMulti must be >= 0, got $targetMulti")
    val dec = "decimal(28,9)"
    val w = col("word")
    val chars = vocab.filter(length(col("piece")) === 1)
    val multi = vocab.filter(length(col("piece")) > 1)
    val words = multi.select(col("piece").as("word"),
      col("freq").as("__f"), col("logp").cast(dec).as("__lp"))
    // candidates over the piece's OWN string, full span excluded
    val cands = words.select(w, explode(flatten(
        transform(sequence(lit(1), length(w)), s =>
          transform(sequence(lit(1), least(lit(maxPieceLen), length(w) - s + 1)),
            l => struct((s - 1).as("i"), (s - 1 + l).as("j"),
              w.substr(s, l).as("piece")))))).as("c"))
      .select(w, col("c.i").as("i"), col("c.j").as("j"), col("c.piece").as("piece"))
      .filter(!(col("i") === 0 && col("j") === length(w)))
      .join(vocab.select(col("piece"), col("logp")), "piece")
    val byWord = cands.groupBy("word")
      .agg(collect_list(struct(col("i"), col("j"),
        col("logp").cast(dec).as("logp"))).as("__cands"))
    val dp = aggregate(
      sequence(lit(1), length(w)),
      array(struct(lit(BigDecimal(0)).cast(dec).as("best"), lit(-1).as("from"))),
      (acc: Column, j: Column) => {
        val scored = transform(
          filter(col("__cands"), c => c.getField("j") === j),
          c => struct(
            (element_at(acc, c.getField("i") + 1).getField("best")
              + c.getField("logp")).cast(dec).as("best"),
            (-c.getField("i")).as("negi")))
        val pick = array_max(scored)
        concat(acc, array(struct(pick.getField("best").as("best"),
          (-pick.getField("negi")).as("from"))))
      })
    val alts = byWord
      .select(w.as("piece"),
        element_at(dp, length(w) + 1).getField("best").as("__alt"))
    val scoredMulti = words.withColumnRenamed("word", "piece")
      .join(alts, Seq("piece"), "left")
      .select(col("piece"), col("__f").as("freq"),
        // essential pieces (no alternative segmentation) outrank all
        col("__alt").isNull.as("__ess"),
        (col("__lp") - coalesce(col("__alt"), lit(BigDecimal(0)).cast(dec)))
          .cast(dec).multiply(col("__f")).as("__loss"))
    val keptMulti = scoredMulti
      .orderBy(col("__ess").desc, col("__loss").desc, col("piece").asc)
      .limit(targetMulti)
      .select(col("piece"), col("freq"))
    val kept = chars.select(col("piece"), col("freq")).unionByName(keptMulti)
    val total = kept.agg(sum(col("freq")).as("__t"))
    kept.join(broadcast(total))
      .select(col("piece"), col("freq"),
        round(log(col("freq").cast("double") / col("__t")), 9)
          .cast("decimal(28,9)").cast("double").as("logp"))
  }

  /** The unigram-LM training loop: seed ([[unigramSeedVocab]]), then
    * `rounds` EM iterations of Viterbi-segment → recount
    * ([[unigramReestimate]]) — Kudo's algorithm with the simplified
    * prune rule that pieces unused by any Viterbi path drop out
    * (their re-estimated count is 0). With `pruneTo` set, each round
    * additionally prunes the multi-char vocabulary by likelihood loss
    * ([[unigramPrune]]) — shrinking at most `pruneShrink` per round
    * (SentencePiece's keep-top-80% schedule) until the target size is
    * reached, the coverage floor always intact. The vocab table is
    * the loop state (vocab-sized, lineage cut per round — the
    * connectedComponents/bpeTrain driver-loop pattern); on a corpus
    * whose segmentation stabilizes, the loop is a fixpoint and extra
    * rounds are no-ops. Returns the final (piece, freq, logp). */
  def unigramTrain(docs: DataFrame, rounds: Int = 2, maxPieceLen: Int = 4,
                   vocabSize: Int = 20, idCol: String = "doc_id",
                   textCol: String = "text",
                   pruneTo: Option[Int] = None,
                   pruneShrink: Double = 0.8): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    require(pruneShrink > 0.0 && pruneShrink <= 1.0,
      s"pruneShrink must be in (0, 1], got $pruneShrink")
    var vocab = unigramSeedVocab(docs, maxPieceLen, vocabSize, textCol)
      .localCheckpoint()
    // SentencePiece's required-character floor, active only in prune
    // mode: reestimate drops pieces (including single chars) whose
    // Viterbi count is 0, but a pruned vocab MUST keep every corpus
    // character or coverage breaks — dropping several low-loss pieces
    // at once can strand a span no remaining piece combination spans.
    // Chars that fell out re-enter at a 1-count smoothing before each
    // prune, exactly the required_chars handling in Kudo's trainer.
    // (The default no-prune loop stays byte-identical to the q148
    // contract: reestimate alone, no floor.)
    val floorChars = vocab.filter(length(col("piece")) === 1)
      .select("piece").localCheckpoint()
    def withCharFloor(v: DataFrame): DataFrame = {
      val missing = floorChars.join(v, Seq("piece"), "left_anti")
        .select(col("piece"), lit(1L).as("freq"))
      val all = v.select(col("piece"), col("freq")).unionByName(missing)
      val total = all.agg(sum(col("freq")).as("__t"))
      all.join(broadcast(total))
        .select(col("piece"), col("freq"),
          round(log(col("freq").cast("double") / col("__t")), 9)
            .cast("decimal(28,9)").cast("double").as("logp"))
    }
    for (_ <- 1 to rounds) {
      vocab = unigramReestimate(docs, vocab, maxPieceLen, idCol, textCol)
        .localCheckpoint()
      pruneTo.foreach { target =>
        vocab = withCharFloor(vocab).localCheckpoint()
        // vocab-sized count on the checkpointed table — a bounded
        // driver action (the bpeTrain argmax class)
        val multiNow = vocab.filter(length(col("piece")) > 1).count()
        if (multiNow > target) {
          val step = math.max(target.toLong,
            math.floor(multiNow * pruneShrink).toLong).toInt
          vocab = unigramPrune(vocab, step, maxPieceLen).localCheckpoint()
        }
      }
    }
    vocab
  }

  /** Skip-gram (center, context) pair counts — the training-data
    * generation pass for word2vec / GloVe-style embedding training
    * (Mikolov et al. 2013): every token pairs with each neighbor
    * within `window` positions on either side, and the corpus-wide
    * co-occurrence counts come out aggregated.
    *
    * Scale shape: the pair expansion is a NARROW per-row array walk —
    * for each position two `slice`s (left/right context) off the
    * row's own token array, never a positional self-join — so the
    * only shuffle is the final (center, context) group-by, whose
    * map-side partials bound each task's output by the co-occurring
    * vocabulary, not the token stream. Output (center, context, cnt). */
  def skipgramPairs(docs: DataFrame, window: Int = 2,
                    textCol: String = "text"): DataFrame = {
    require(window >= 1, s"skip-gram window must be >= 1, got $window")
    val tl = col("__tl")
    val pairs = docs.select(TextAnalysis.tokens(col(textCol)).as("__tl"))
      .select(explode(flatten(transform(tl, (t, i) => {
        // i is 0-based; slice() is 1-based. Left context occupies
        // positions max(1, i+1-window)..i (length min(i, window)),
        // right context i+2..i+1+window (slice clamps at array end).
        val left = slice(tl, greatest(i + 1 - window, lit(1)), least(i, lit(window)))
        val right = slice(tl, i + 2, lit(window))
        transform(concat(left, right),
          c => struct(t.as("center"), c.as("context")))
      }))).as("__p"))
    pairs.select(col("__p.center").as("center"), col("__p.context").as("context"))
      .groupBy("center", "context")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Length-bucketed batching report — the padding-waste audit that
    * picks a training loader's bucket boundaries. Sequences are
    * truncated to `maxLen` first (as the loader would), then bucketed
    * by `bucketWidth` tokens; per bucket the report carries the doc
    * and real-token counts plus the padded-token overhead under (a)
    * bucketed batching — every sequence padded to its bucket's cap —
    * and (b) naive global padding to `maxLen`. The difference is the
    * compute the bucketing saves. All-integer outputs (counts and
    * token sums), so the report is exact in any engine.
    *
    * Scale shape: narrow per-row length math, then ONE group-by onto
    * ≤ maxLen/bucketWidth bucket rows — map-side partials collapse
    * each task to the bucket table. */
  def paddingStats(docs: DataFrame, maxLen: Int = 512, bucketWidth: Int = 64,
                   textCol: String = "text"): DataFrame = {
    require(maxLen > 0 && bucketWidth > 0 && maxLen % bucketWidth == 0,
      s"maxLen ($maxLen) must be a positive multiple of bucketWidth ($bucketWidth)")
    docs.select(least(size(TextAnalysis.tokens(col(textCol))).cast("long"),
        lit(maxLen.toLong)).as("__n"))
      .filter(col("__n") > 0)
      .withColumn("bucket", expr(s"(__n - 1) div ${bucketWidth}L"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
      .withColumn("bucket_cap",
        least((col("bucket") + 1) * bucketWidth, lit(maxLen.toLong)))
      .withColumn("pad_bucketed", col("n_docs") * col("bucket_cap") - col("n_tokens"))
      .withColumn("pad_global", col("n_docs") * maxLen - col("n_tokens"))
      .select("bucket", "bucket_cap", "n_docs", "n_tokens", "pad_bucketed", "pad_global")
  }
}
