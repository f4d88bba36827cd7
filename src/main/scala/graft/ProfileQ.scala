package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev utility: run SparkEntry queries with a listener that counts
  * jobs / stages / tasks and sums executor task time, so a slow query
  * can be attributed to scheduling overhead (wall >> task-time/cores)
  * vs genuine compute (task-time-bound). Two timed runs per query
  * (first absorbs codegen), the second is reported.
  *
  * `runMain graft.ProfileQ q139_knn_clusters [q150_...]`
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // suite-sized codegen-class cache (default 100 thrashes; see Bench)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BYPASS", "200"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "4m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskNanos = 0L   // executor run time (ms summed)
    @volatile var gcMs = 0L
    @volatile var shuffleWriteBytes = 0L
    val stageTime = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val stageName = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        stageName.put(s.stageInfo.stageId,
          s.stageInfo.name.take(60) + " || " +
            s.stageInfo.details.linesIterator
              .filter(l => l.contains("graft") && !l.contains("ProfileQ"))
              .take(2).mkString(" <- ").take(160))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        val m = t.taskMetrics
        if (m != null) {
          taskNanos += m.executorRunTime * 1000000L
          gcMs += m.jvmGCTime
          shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
          stageTime.merge(t.stageId, m.executorRunTime, (a, b) => a + b)
          stageTasks.merge(t.stageId, 1, (a, b) => a + b)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (q <- args) {
      var wall = 0.0
      (1 to 2).foreach { run =>
        jobs = 0; stages = 0; tasks = 0; taskNanos = 0L; gcMs = 0L
        shuffleWriteBytes = 0L
        stageTime.clear(); stageTasks.clear(); stageName.clear()
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        wall = (System.nanoTime() - t0) / 1e9
        // let straggler task-end events drain before reading counters
        Thread.sleep(200)
        println(f"[profile] $q run=$run wall=$wall%.2f s jobs=$jobs " +
          f"stages=$stages tasks=$tasks taskTime=${taskNanos / 1e9}%.2f s " +
          f"gc=${gcMs / 1e3}%.2f s shufWrite=${shuffleWriteBytes / 1024}%d KiB")
        if (run == 2) {
          import scala.jdk.CollectionConverters._
          stageTime.asScala.toSeq.sortBy(-_._2).take(12).foreach {
            case (sid, ms) =>
              println(f"[stage] $q $sid%5d ${ms / 1e3}%7.2f s " +
                f"tasks=${stageTasks.getOrDefault(sid, 0)}%3d " +
                stageName.getOrDefault(sid, "?"))
          }
        }
      }
    }
    spark.stop()
  }
}
