package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.EventStreams

/** Loading helpers for the fixture star schema (TESTDATA.md).
  * One parquet dataset per table under `$dir/<name>.parquet`.
  *
  * `events.ts` is stored as TIMESTAMP(NANOS), which Spark reads only as
  * a long (with `spark.sql.legacy.parquet.nanosAsLong=true`, set by all
  * graft sessions); [[load]] normalizes it to a microsecond timestamp.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") EventStreams.withEventTime(df) else df
  }
}
