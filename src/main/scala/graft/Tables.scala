package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loading helpers for the fixture star schema (TESTDATA.md).
  * One parquet dataset per table under `$dir/<name>.parquet`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
