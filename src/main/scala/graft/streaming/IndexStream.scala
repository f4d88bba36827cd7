package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.Similarity

/** Continuous embedding ingestion into a persisted IVF index — the
  * vector-side sibling of [[CurationStream]]: a stream of embedding
  * rows (e.g. a parquet landing directory tailed with `readStream`)
  * is folded into the index at `path` one micro-batch at a time.
  *
  * Scale contract (inherited from `Similarity.ivfAppendWrite`): every
  * batch is O(batch) — rows land in their sign-plane cell partitions
  * via parquet append (existing cell files untouched), and the
  * centroid refresh merges the batch's exact-integer partials into
  * the persisted side table; the accumulated corpus is never re-read.
  * Because the partials are associative long sums, the index after N
  * batches is BIT-IDENTICAL to a one-shot build over the union — the
  * append ≡ rebuild contract holds at every step of the stream, so
  * probes (`Similarity.ivfRead` → `ivfQuery`) can run against a live,
  * still-ingesting index.
  *
  * Bootstrap: the first batch to arrive at an empty `path` CREATES
  * the index (`ivfBuildDeterministic` + `ivfWrite`); later batches
  * append. The streaming checkpoint holds only source offsets;
  * `foreachBatch` is at-least-once and the parquet appends are
  * non-transactional (the same trade [[CurationStream]] documents) —
  * a batch replayed after a crash between append and checkpoint
  * appends its rows twice; dedupe readers by id or use a
  * transactional table format in production. */
object IndexStream {

  /** Fold one batch into the index at `path` (create on first use). */
  def appendBatch(batch: DataFrame, path: String, planes: Int, dim: Int,
                  filesPerCell: Int = 1, idCol: String = "vec_id",
                  vecCol: String = "embedding"): Unit = {
    val spark = batch.sparkSession
    if (!Similarity.ivfIndexExists(spark, path))
      Similarity.ivfWrite(
        Similarity.ivfBuildDeterministic(batch, planes, dim, idCol, vecCol),
        path, filesPerCell, vecCol)
    else
      Similarity.ivfAppendWrite(path, batch, planes, dim, filesPerCell,
        idCol, vecCol)
  }

  /** Wire [[appendBatch]] under a streaming source of embedding rows
    * (idCol, vecCol). Batch size is bounded by the source's
    * `maxFilesPerTrigger`/`maxOffsetsPerTrigger`, exactly like the
    * curation loop's landing tail. */
  def ingestStream(embeddings: DataFrame, path: String, checkpointDir: String,
                   planes: Int, dim: Int, filesPerCell: Int = 1,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    embeddings.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) appendBatch(b.localCheckpoint(), path, planes, dim,
          filesPerCell, idCol, vecCol)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
