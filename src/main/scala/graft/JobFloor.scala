package graft

import org.apache.spark.sql.SparkSession

/** Micro-measure of the local-mode per-job / per-stage scheduling floor
  * behind the r20 bench numbers: times trivial 1-task jobs, a 2-stage
  * shuffle job, and a small grouped aggregate, with AQE on vs off — the
  * evidence for how much of a 219-query surface's wall is fixed job
  * overhead rather than data work.
  *
  * Usage: runMain graft.JobFloor [sfDir]   (default $SPARK_GRAFT_SF_DIR,
  * falling back to /root/testdata/sf0.1 — advice r20: the tool was pinned
  * to this machine's path)
  */
object JobFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(n: Int)(f: => Unit): Double = {
      f // warm
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      (System.nanoTime() - t0) / 1e9 / n
    }
    import spark.implicits._
    val small = spark.read.parquet(s"$sfDir/documents.parquet")
    small.count()
    for (aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val t1 = time(20)(spark.range(1).queryExecution.toRdd.foreach(_ => ()))
      val t2 = time(20)(spark.range(1000)
        .groupBy(($"id" % 7).as("k")).count()
        .queryExecution.toRdd.foreach(_ => ()))
      val t3 = time(10)(small.groupBy("source").count()
        .queryExecution.toRdd.foreach(_ => ()))
      val t4 = time(10) {
        val a = small.groupBy("source").agg(
          org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
        val b = small.select("doc_id", "source")
        a.join(b, "source").groupBy("source")
          .agg(org.apache.spark.sql.functions.sum("doc_id"))
          .queryExecution.toRdd.foreach(_ => ())
      }
      println(f"aqe=$aqe  1task=${t1 * 1000}%.1f ms  shuffle1k=${t2 * 1000}%.1f ms  docsAgg=${t3 * 1000}%.1f ms  aggJoin=${t4 * 1000}%.1f ms")
    }
    spark.stop()
  }
}
