package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query job/stage/task profiler for the optimization loop.
  *
  * Runs each named query exactly like Bench (same session shape, same
  * noop sink) with a listener attached, and prints one line per query:
  * wall seconds, number of Spark jobs, stages, tasks, summed executor
  * task time, summed shuffle read/write bytes, and GC delta. A query
  * whose wall far exceeds taskTime/cores is dominated by DRIVER-side
  * work (planning, manifest IO, stream startup, job-submit latency) —
  * a different fix family than shuffle/compute-bound queries.
  *
  * Usage: runMain graft.Prof <sfDir> [queryName...]
  * Runs each query `SPARK_GRAFT_PROF_RUNS` times (default 2) and
  * reports the LAST run (warm codegen), matching the bench's
  * steady-state measurement.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_PROF_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tuning.install(spark)

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    @volatile var shufR = 0L
    @volatile var shufW = 0L
    @volatile var inB = 0L
    val dumpStages = sys.env.contains("SPARK_GRAFT_PROF_STAGES")
    // SPARK_GRAFT_PROF_JOBS: print every job's wall duration, task count
    // and submitting callsite — the attribution view for driver-bound
    // queries (many tiny jobs, wall >> taskTime/cores), where the fix is
    // removing jobs, and the callsite says which code path submits them.
    val dumpJobs = sys.env.contains("SPARK_GRAFT_PROF_JOBS")
    val jobStart = scala.collection.concurrent.TrieMap.empty[Int, (Long, String)]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        if (dumpJobs) {
          val cs = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          val nt = j.stageInfos.map(_.numTasks).sum
          jobStart.update(j.jobId, (j.time, f"t=$nt%-4d $cs"))
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        if (dumpJobs) jobStart.remove(j.jobId).foreach { case (t0, cs) =>
          println(f"  [job ${j.jobId}%4d] ${(j.time - t0) / 1e3}%7.3fs  $cs")
        }
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        if (dumpStages) {
          val i = s.stageInfo
          val rt = i.taskMetrics.executorRunTime / 1e3
          if (rt > 0.2)
            println(f"  [stage ${i.stageId}%4d] n=${i.numTasks}%3d run=$rt%8.2fs cpu=${i.taskMetrics.executorCpuTime / 1e9}%8.2fs ${i.name.take(90)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          taskMs += m.executorRunTime
          shufR += m.shuffleReadMetrics.totalBytesRead
          shufW += m.shuffleWriteMetrics.bytesWritten
          inB += m.inputMetrics.bytesRead
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    import scala.jdk.CollectionConverters._
    def gcMillis(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

    println(f"${"query"}%-45s ${"wall"}%7s ${"jobs"}%5s ${"stg"}%5s ${"task"}%6s ${"taskSec"}%8s ${"shufMB"}%7s ${"inMB"}%7s ${"gcSec"}%6s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      var out = ""
      for (r <- 1 to nRuns) {
        // settle the async listener queue so counts attribute to the
        // right query (listenerBus is private[spark]; a short drain
        // sleep is accurate enough for profiling)
        Thread.sleep(300)
        jobs = 0; stages = 0; tasks = 0; taskMs = 0L; shufR = 0L; shufW = 0L; inB = 0L
        val g0 = gcMillis()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300)
          out = f"$name%-45s $wall%7.3f $jobs%5d $stages%5d $tasks%6d ${taskMs / 1e3}%8.2f ${(shufR + shufW) / 1e6}%7.1f ${inB / 1e6}%7.1f ${(gcMillis() - g0) / 1e3}%6.2f"
        } catch {
          case e: Throwable =>
            out = f"$name%-45s FAILED ${e.getMessage}"
        }
      }
      println(out)
    }
    spark.stop()
  }
}
