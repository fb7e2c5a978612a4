package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-loop measurement harness (guide §1: measure first): run named
  * queries repeatedly in one warmed session and report per-run wall
  * seconds plus the run's job/stage/task counts and shuffle volume.
  * Job-count tells whether a row is scheduler-overhead-bound (many tiny
  * jobs — iterative loops, eager guards) or compute-bound; shuffle bytes
  * tell whether it is exchange-bound. Bench stays the published number;
  * this is the magnifying glass.
  *
  *   sbt "runMain graft.Profile q_url_alias,q_lm_filter /root/testdata/sf0.1 3"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Profile <q1,q2,...> <sfDir> [reps]")
    val names = args(0).split(",").toSeq
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    // SPARK_GRAFT_WARM=skip: dev-loop knob — skip the full session warm
    // (~minutes of staging) when iterating on one query; rep 1 then
    // absorbs that query's own staging, so read reps 2+ only
    if (!sys.env.get("SPARK_GRAFT_WARM").contains("skip"))
      graft.queries.ExtensionQueries.warmSessionModels(spark, sfDir)
    spark.catalog.clearCache()
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        shuffleRead += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        shuffleWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })
    val qs = SparkEntry.queries
    names.foreach { name =>
      require(qs.contains(name), s"unknown query: $name")
      (1 to reps).foreach { r =>
        jobs = 0; stages = 0; tasks = 0; shuffleRead = 0L; shuffleWrite = 0L
        spark.sparkContext.setJobDescription(s"$name run $r")
        val t0 = System.nanoTime()
        qs(name)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events drain asynchronously; settle before reading
        Thread.sleep(300)
        println(f"[profile] $name%-28s run$r $dt%7.3f s  jobs=$jobs%-3d " +
          f"stages=$stages%-4d tasks=$tasks%-5d shufR=${shuffleRead / 1e6}%8.1f MB " +
          f"shufW=${shuffleWrite / 1e6}%8.1f MB")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
