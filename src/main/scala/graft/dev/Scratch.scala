package graft.dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    try {
      val ev = spark.read.parquet(s"$dir/events.parquet")
      ev.printSchema()
      ev.select(col("ts")).show(2, false)
    } catch { case e: Throwable => println("[scratch] events read FAILED: " + e.getMessage.take(300)) }
    // dot product: sequential double fold over zip_with
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val dot = emb.select(col("vec_id"),
      aggregate(zip_with(col("embedding"), col("embedding"), (a, b) => a.cast("double") * b.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("dp"))
    dot.orderBy("vec_id").limit(3).write.mode("overwrite").parquet("/tmp/parity_dot")
    // md5 over tokens
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc_id").agg(min(md5(concat(col("tok"), lit("#0")))).as("mh0"))
      .orderBy("doc_id").limit(3).write.mode("overwrite").parquet("/tmp/parity_md5")
    println("[scratch] done")
    spark.stop()
  }
}
