package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time the langid pipeline's pieces in isolation. */
object LangProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.load(spark, sfDir, "documents")
      .repartition(32)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[langprobe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"[langprobe] pass $pass")
      val census = time("census collect-count") {
        val c = docs.select(col("doc_id"), col("lang").as("lang_true"),
            graft.functions.CharNgramCounts(col("text"), 3).as("__cn"),
            (length(col("text")) - 2).cast("long").as("ktot"))
          .localCheckpoint(eager = false)
        c.count(); c
      }
      val dk = census.select(col("doc_id"), col("lang_true"),
        explode(col("__cn")).as(Seq("ng", "k")))
      time("dk explode count") { dk.write.format("noop").mode("overwrite").save() }
      val prof = time("prof build") {
        val p = dk.groupBy(col("lang_true").as("lang_cand"), col("ng"))
          .agg(sum(col("k")).as("c")).localCheckpoint(eager = false)
        p.count(); p
      }
      val vocabV = prof.select("ng").distinct().count()
      val li = prof.groupBy("lang_cand").agg(sum(col("c")).as("tot"))
        .select(col("lang_cand"), col("tot"), lit(vocabV).as("V"))
      val profW = prof.join(broadcast(li), Seq("lang_cand"))
        .select(col("lang_cand"), col("ng"),
          round(round(log((col("c") + 1).cast("double")
            / (col("tot") + col("V")).cast("double")), 9) * 1e9).cast("long").as("__w"))
      val pres = dk.join(broadcast(profW), Seq("ng"))
        .groupBy(col("doc_id"), col("lang_cand"))
        .agg(sum(col("k") * col("__w")).as("sp"), sum(col("k")).as("kp"))
      time("pres join+agg") { pres.write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
