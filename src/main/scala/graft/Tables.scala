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

  // PLAN cache, not a data cache: `spark.read.parquet` eagerly lists
  // the path and reads a footer to infer the schema — pure driver
  // metadata work repeated identically for every one of the hundreds
  // of queries touching the same fixture tables in one session. The
  // cached object is the LAZY DataFrame (a logical plan); every
  // action still scans the parquet input — this is what a catalog
  // does for a real table's schema at any scale. Keyed per session
  // (weakly, so a stopped session's entries are collectable).
  // INVARIANT: fixture dirs are immutable for a session's lifetime —
  // the cached plan pins the file listing captured at first load, so
  // a tool that regenerates testdata in-session must use a fresh
  // session (or this cache would serve stale file lists).
  private val planCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val bySession = planCache.synchronized {
      var m = planCache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        planCache.put(spark, m)
      }
      m
    }
    bySession.computeIfAbsent(s"$dir/$name.parquet", { path =>
      val df = spark.read.parquet(path)
      if (name == "events") EventStreams.withEventTime(df) else df
    })
  }
}
