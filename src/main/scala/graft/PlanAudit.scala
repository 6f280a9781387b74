package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit harness behind BENCH_NOTES.md: for each named query, print
  * how often hot expressions appear in the optimized plan (the
  * CollapseProject re-evaluation pitfall) and its cold/warm runtime in this
  * JVM — the evidence a bench-spike triage needs to rule the plan in or out.
  *
  * Usage: runMain graft.PlanAudit <sfDir> <queryName> [queryName ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanAudit <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hot = Seq("regexp_replace", "split(", "filter(", "transform(",
      "md5(", "CartesianProduct", "Exchange", "Exchange SinglePartition",
      "Window")
    args.drop(1).foreach { name =>
      // time the FULL query-fn call + execution, exactly like Bench does —
      // registry builds and driver-side math run inside the fn call, so
      // timing only a prebuilt frame's execution under-measures
      def run(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.toRdd.foreach(_ => ())
        (System.nanoTime() - t0) / 1e9
      }
      val cold = run()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val opt = df.queryExecution.optimizedPlan.toString
      val phys = df.queryExecution.executedPlan.toString
      def occ(s: String, h: String) = s.sliding(h.length).count(_ == h)
      val counts = hot.map { h =>
        // 'Exchange' is a substring of both 'Exchange SinglePartition' and
        // 'BroadcastExchange': subtract both overlaps so the counter reads
        // shuffle exchanges only (advice r8 + r9)
        def adj(s: String) =
          if (h == "Exchange")
            occ(s, h) - occ(s, "Exchange SinglePartition") - occ(s, "BroadcastExchange")
          else occ(s, h)
        s"$h=${adj(opt)}/${adj(phys)}"
      }.mkString(" ")
      println(s"[$name] optimized/physical occurrences: $counts")
      println(f"[$name] cold $cold%.2f s, warm ${run()}%.2f s, warm ${run()}%.2f s")
    }
    spark.stop()
  }
}
