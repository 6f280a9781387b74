package graft
import org.apache.spark.sql.SparkSession
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local dev
    // loop — run ONE query + its oracle instead of the full surface;
    // the driver always passes exactly two args)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // driver-side partition-dir listing on local fs (r21, see Bench)
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PAR_THRESHOLD", "10000"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter(kv => names(kv._1)))
    selected.foreach { case (name, fn) =>
      // remove any stale dump first: a failed query must not leave a
      // previous run's output behind for the comparer to pick up
      val dest = new java.io.File(s"$outDir/$name")
      if (dest.exists()) VerifyIO.deleteRec(dest)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    VerifyIO.writeOracleJson(outDir,
      only.fold(SparkEntry.oracleSql)(names =>
        SparkEntry.oracleSql.filter(kv => names(kv._1))))
    spark.stop()
  }
}
