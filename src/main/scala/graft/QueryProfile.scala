package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query cost breakdown behind the r20 optimization round: for each
  * named query (or the whole surface), time the WARM steady-state pass the
  * bench reports, split into fn-construction (driver/Catalyst/eager builds)
  * vs execution (toRdd + foreach), and count the Spark jobs / stages /
  * tasks the timed pass schedules. A query whose wall is mostly
  * construction or that schedules many sequential jobs is bound by the
  * driver, not the executors — the exact class of cost that does NOT
  * parallelize with cores (guide §2.6/§5).
  *
  * Usage: runMain graft.QueryProfile <sfDir> [query ...]   (default: all)
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProfile <sfDir> [query ...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // driver-side partition-dir listing on local fs (r21, see Bench)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PAR_THRESHOLD", "10000"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0L)
    // SPARK_GRAFT_PROFILE_JOBS=1: per-job drill-down (r21) — job id,
    // first-stage name, task count, summed task ms — to attribute a
    // query's tasks to the operator that scheduled them
    val perJob = sys.env.getOrElse("SPARK_GRAFT_PROFILE_JOBS", "0") == "1"
    val jobName = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val jobTasks = new java.util.concurrent.ConcurrentHashMap[Int, AtomicInteger]()
    val jobTaskMs = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (perJob) {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
          jobName.put(j.jobId, if (desc.nonEmpty) desc else site)
          jobTasks.put(j.jobId, new AtomicInteger(0))
          jobTaskMs.put(j.jobId, new AtomicLong(0L))
          j.stageIds.foreach(sid => stageJob.put(sid, j.jobId))
        }
      }
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
        if (perJob && t.taskInfo != null) {
          val jid = stageJob.getOrDefault(t.stageId, -1)
          if (jid >= 0) {
            jobTasks.get(jid).incrementAndGet()
            jobTaskMs.get(jid).addAndGet(t.taskInfo.duration)
          }
        }
      }
    })
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    // page-cache / footer warmup, as Bench does
    Seq("lineitem.parquet", "documents.parquet", "embeddings.parquet")
      .foreach(tbl => spark.read.parquet(s"$sfDir/$tbl").limit(10).count())
    println("query,warm_total_s,construct_s,exec_s,jobs,stages,tasks,task_ms")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // untimed warmup pass — codegen, page cache, one-time builds
      try fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[profile] $name warmup FAILED: ${e.getMessage}") }
      System.gc()
      jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0L)
      jobName.clear(); jobTasks.clear(); jobTaskMs.clear(); stageJob.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      try df.queryExecution.toRdd.foreach(_ => ())
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[profile] $name FAILED: ${e.getMessage}") }
      val t2 = System.nanoTime()
      // listener events are async; give the bus a beat before reading
      Thread.sleep(150)
      def s(a: Long, b: Long): String =
        "%.3f".formatLocal(java.util.Locale.ROOT, (b - a) / 1e9)
      println(s"$name,${s(t0, t2)},${s(t0, t1)},${s(t1, t2)}," +
        s"${jobs.get},${stages.get},${tasks.get},${taskMs.get}")
      if (perJob) {
        import scala.jdk.CollectionConverters._
        jobName.asScala.toSeq.sortBy(_._1).foreach { case (jid, nm) =>
          println(f"  job $jid%4d tasks=${jobTasks.get(jid).get}%4d " +
            f"task_ms=${jobTaskMs.get(jid).get}%6d  ${nm.take(110)}")
        }
      }
    }
    spark.stop()
  }
}
