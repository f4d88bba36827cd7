package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Similarity

/** Continuous embedding ingestion: streaming the corpus into the
  * persisted IVF index in micro-batches must leave EXACTLY the index a
  * one-shot build over the whole corpus writes — the append ≡ rebuild
  * contract holding at every step of the stream. */
class IndexStreamSpec extends SparkSpec {

  test("streamed micro-batch ingest ≡ one-shot build: assigned, centroids, probes") {
    val emb = load("embeddings")
    val root = Files.createTempDirectory("graft-ivf-stream").toString
    val (landing, streamed, rebuilt, ckpt) =
      (s"$root/landing", s"$root/streamed", s"$root/rebuilt", s"$root/ckpt")

    // land the corpus as 3 parquet slices; maxFilesPerTrigger=1 forces
    // one CREATE batch (bootstrap) and two APPEND batches
    emb.repartition(3).write.parquet(landing)
    val q = IndexStream.ingestStream(
      spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1).parquet(landing),
      streamed, ckpt, planes = 4, dim = 64)
    assert(q.awaitTermination(180000), "stream did not drain in time")

    Similarity.ivfWrite(
      Similarity.ivfBuildDeterministic(emb, planes = 4, dim = 64), rebuilt)

    val (i1, i2) =
      (Similarity.ivfRead(spark, streamed), Similarity.ivfRead(spark, rebuilt))
    val cols = i2.assigned.columns.sorted.toIndexedSeq.map(col)
    assert(i1.assigned.select(cols: _*).exceptAll(i2.assigned.select(cols: _*)).isEmpty &&
      i2.assigned.select(cols: _*).exceptAll(i1.assigned.select(cols: _*)).isEmpty,
      "streamed assigned rows must equal the rebuild's")
    // centroid means are exact-integer partial merges → bit-identical
    val (c1, c2) = (Similarity.readCentroids(spark, streamed),
      Similarity.readCentroids(spark, rebuilt))
    assert(c1.exceptAll(c2).isEmpty && c2.exceptAll(c1).isEmpty,
      "streamed centroids must be bit-identical to the rebuild's")
    val p1 = Similarity.ivfQuery(i1, Seq(5L, 6L), k = 3, nProbe = 2)
    val p2 = Similarity.ivfQuery(i2, Seq(5L, 6L), k = 3, nProbe = 2)
    assert(p1.exceptAll(p2).isEmpty && p2.exceptAll(p1).isEmpty,
      "probes against the live index must equal the rebuild's")
  }
}
