package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet-footer paths so startup cost doesn't land
    // on whichever query happens to run first — all three hot tables, not
    // just lineitem (documents/embeddings footer reads were landing on the
    // alphabetically-first query that touched each)
    spark.range(1000).selectExpr("sum(id)").collect()
    Seq("lineitem", "documents", "embeddings").foreach { tbl =>
      spark.read.parquet(s"$sfDir/$tbl.parquet").limit(10).count() }
    // Per-query warmup pass (verdict r7 #6): rounds 6/7 ran byte-identical
    // binaries yet swung ±13× on individual queries (q_gopher_rules
    // 0.84→10.88 s) — JIT compilation, codegen caching, parquet page-cache
    // faults, and one-time registry index builds were landing on whichever
    // timed pass hit them first. Run each query once untimed, then report
    // the timed steady-state pass. SPARK_GRAFT_WARMUP=0 restores the
    // single-pass cold numbers.
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      if (warmup) {
        // NonFatal only (advice r8): a warmup OOM/VM error must fail loudly,
        // not leave the timed pass running in a silently degraded heap
        try fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ())
        catch { case scala.util.control.NonFatal(_) => () } // re-surfaces in the timed pass
      }
      val t0 = System.nanoTime()
      // materialize every column (count() would let Catalyst prune the
      // projections and under-measure projection-heavy queries)
      val ok = try { fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ()); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // 3-decimal (ms) precision keeps the whole line inside the driver's
    // 2000-char stdout tail window; full precision adds ~6 chars/query and
    // pushed rounds 1-4 past the window (parsed:null every round).
    def sec(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // stop() first: its shutdown logging must not land after the JSON line
    spark.stop()
    println(line)
  }
}
