package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: connectedComponents round count on synthetic graphs
  * (chain / 2-regular rings) — validates the pointer-jump reach
  * analysis empirically. `runMain graft.CcProbe [n]` */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val chain = (0L until n.toLong).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("doc_a", "doc_b")
    val t0 = System.nanoTime()
    val cc = graft.ext.Dedup.connectedComponents(chain)
    val bad = cc.filter(org.apache.spark.sql.functions.col("comp") =!= 0L).count()
    println(f"[ccprobe] chain n=$n badLabels=$bad " +
      f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
