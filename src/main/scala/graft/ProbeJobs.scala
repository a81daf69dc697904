package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch perf probe with a job timeline: prints every Spark job's
  * wall span during the SECOND (warm) run of a query, so driver-side
  * gaps (planning, codegen, collect processing) show up as holes
  * between jobs. Not part of the library surface.
  */
object ProbeJobs {
  def main(args: Array[String]): Unit = {
    // cores from the bench contract's env var (ADVICE r15: hardcoded
    // local[32] could diverge from the benched configuration)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args(0); val sf = args(1)
    // warm run
    SparkEntry.queries(name)(spark, sf).count()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    // written on the main thread after listener registration, read on
    // the listener-bus thread (ADVICE r15: a stale read printed
    // absolute-epoch offsets)
    @volatile var t0 = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(js.jobId, (js.time, desc.take(60)))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (start, desc) =>
          println(f"[job] ${je.jobId}%4d start=${(start - t0) / 1e3}%8.3f end=${(je.time - t0) / 1e3}%8.3f dur=${(je.time - start) / 1e3}%7.3f  $desc")
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {
          s <- si.submissionTime; e <- si.completionTime
        } yield (e - s) / 1e3
        if (dur.exists(_ > 0.15))
          println(f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%3d dur=${dur.getOrElse(0.0)}%7.3f  ${si.name.take(70)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    t0 = System.currentTimeMillis()
    val n = SparkEntry.queries(name)(spark, sf).count()
    val wall = (System.currentTimeMillis() - t0) / 1e3
    Thread.sleep(500) // let listener events drain
    println(f"[probejobs] $name n=$n wall=$wall%.3f s")
    spark.stop()
  }
}
