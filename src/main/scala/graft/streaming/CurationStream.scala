package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Dedup

/** The continuous-curation loop — the production composition of
  * streaming JSONL ingestion (`sources.CorpusIO.readJsonlStream`) with
  * incremental near-dup screening (`ext.Dedup.incrementalCandidatePairs`):
  * a landing directory is tailed as a Structured Streaming source, and
  * each micro-batch (today's crawl drop) is screened against the
  * PERSISTED band index of everything accepted so far; batch documents
  * that near-dup an indexed document are dropped, and the survivors'
  * bands are appended to the index so the NEXT batch screens against
  * them too.
  *
  * Scale contract (inherited from the batch form, q96): the accumulated
  * corpus is never re-shingled and its band index is never reshuffled —
  * per batch, the only per-corpus work is the band-index scan probing
  * the broadcast batch bands. State lives entirely in two parquet
  * tables (the band index and the curated corpus); the streaming
  * checkpoint holds only source offsets, so the loop resumes after a
  * crash without rescreening delivered batches.
  *
  * Reference analogue: the incremental-ingest shape is this engine's
  * flagship extension of the reference's one-shot copy pipeline
  * (`CopyUtils.java:712-733`'s scan→filter→sink loop, run forever).
  */
object CurationStream {

  /** Screen ONE batch against the band index at `indexPath`, then
    * append the survivors to `corpusPath` and their bands to the
    * index. Returns the (existing, batch) candidate pairs that caused
    * drops — callers audit or sink them (`pairsPath` appends them as
    * parquet when set).
    *
    * Bootstrap: initialize `indexPath` once with the existing corpus's
    * bands (`Dedup.lshBands(Dedup.minhash(corpus, bands·rowsPerBand))`)
    * — or an empty frame of the same schema for a from-scratch corpus.
    * Id spaces of batches and corpus must be disjoint (enforce
    * upstream; crawl ids are content-addressed or monotone in
    * practice).
    *
    * In-batch duplicates: `dedupWithinBatch` additionally collapses
    * byte-identical docs inside the batch (keep smallest id) before
    * screening — the mandatory exact-dedup pre-stage of the LSH
    * family, applied at the batch boundary where it is cheap. NEAR-dup
    * (not byte-identical) pairs within one batch entered together and
    * are not screened against each other here; when that matters, run
    * the batch `Dedup.candidatePairs` over the accumulated index as a
    * periodic compaction (a day's drop rarely near-dups itself without
    * being byte-identical). */
  def screenBatch(batch: DataFrame, indexPath: String, corpusPath: String,
                  bands: Int, rowsPerBand: Int, shingleN: Int = 3,
                  idCol: String = "doc_id", textCol: String = "text",
                  pairsPath: Option[String] = None,
                  dedupWithinBatch: Boolean = true): DataFrame = {
    val spark = batch.sparkSession
    // materialize the batch once: it feeds exact dedup, screening, the
    // band build and the corpus sink (micro-batch-sized, bounded by
    // maxFilesPerTrigger upstream)
    val raw = batch.localCheckpoint()
    val b =
      if (!dedupWithinBatch) raw
      else {
        val keep = Dedup.exactByContent(raw, idCol, Seq(textCol))
          .select(col("keep_id").as(idCol))
        raw.join(keep, Seq(idCol), "left_semi")
      }
    val existing = spark.read.parquet(indexPath)
    val pairs = Dedup.incrementalCandidatePairs(
        existing, b, bands, rowsPerBand, shingleN, idCol, textCol)
      .localCheckpoint()
    pairsPath.foreach(p => pairs.write.mode("append").parquet(p))
    val dupIds = pairs.select(col("doc_b").as(idCol)).distinct()
    val survivors = b.join(dupIds, Seq(idCol), "left_anti").localCheckpoint()
    // append order: bands first, corpus second — a crash between the
    // two over-screens (a future near-dup of an unrecorded survivor is
    // dropped against its bands) rather than letting a duplicate in;
    // re-running the batch after restart is idempotent for screening
    // (same pairs) though the sinks append — dedupe downstream readers
    // on idCol or use a transactional table format in production
    Dedup.lshBands(
        Dedup.minhash(survivors, bands * rowsPerBand, shingleN, idCol, textCol),
        bands, rowsPerBand, idCol)
      .write.mode("append").parquet(indexPath)
    survivors.write.mode("append").parquet(corpusPath)
    pairs
  }

  /** Wire [[screenBatch]] under a streaming source: every micro-batch
    * of `landing` (use `CorpusIO.readJsonlStream` — its
    * `maxFilesPerTrigger` bounds batch size) is screened against the
    * index accumulated by all prior batches, stream- and
    * restart-ordered by the Structured Streaming checkpoint at
    * `checkpointDir`. */
  def curateStream(landing: DataFrame, indexPath: String, corpusPath: String,
                   checkpointDir: String, bands: Int, rowsPerBand: Int,
                   shingleN: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text",
                   pairsPath: Option[String] = None,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    landing.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        screenBatch(b, indexPath, corpusPath, bands, rowsPerBand, shingleN,
          idCol, textCol, pairsPath)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
