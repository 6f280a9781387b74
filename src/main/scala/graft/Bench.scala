package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_WARMUP_PAR > 1 switches warmup from the default
    // interleaved protocol to ONE upfront pool-parallel phase — an
    // artifact-wall lever (measured r19 at sf0.1: warmup 266 → 112-125 s)
    // that is OFF by default because it costs comparability: the timed
    // pass runs ~15% above the interleaved protocol's level and the
    // probe loop's generated class stays codegen-cached (reads ~0.15 s
    // against the historical 0.30-0.50 s quiet band). The codegen class
    // cache must then hold the whole surface: at the default 100 entries
    // the timed pass RECOMPILED every query's generated code (+72%
    // timed wall, measured) because 219 warmups evicted everything.
    val warmupPar = sys.env.getOrElse("SPARK_GRAFT_WARMUP_PAR", "1").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Partition-dir LISTING stays driver-side on local filesystems
      // (r21): Spark launches a DISTRIBUTED listing job (1 task per
      // directory) whenever a scan has > threshold dirs, which on
      // file:// turns a ~50 µs/dir stat loop into hundreds of 20 ms
      // tasks per serving-layout read (measured: 512 of q_serving_fsck's
      // 607 tasks were listing tasks). Parameterised for deployments:
      // on an object store set SPARK_GRAFT_LIST_PAR_THRESHOLD back to
      // ~32 so wide listings fan out across executors.
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PAR_THRESHOLD", "10000"))
      .config("spark.ui.enabled", "false")
    if (warmupPar > 1)
      builder.config("spark.sql.codegen.cache.maxEntries", "10000")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Calibration instruments (verdict r12 #1a: the driver's r12 run was
    // 1.36× the builder's at the SAME HEAD and the artifact carried
    // nothing to tell ambient load from a regression):
    //  - gcMs(): cumulative JVM GC time — a loaded/overcommitted box shows
    //    up as GC inflation;
    //  - probe(): a pinned pure-CPU codegen loop (same work every round,
    //    every machine) timed at start and end — the ratio against a quiet
    //    run IS the ambient slowdown factor, independent of the queries;
    //  - load average + cpu count at start and end.
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).filter(_ > 0).sum
    }
    def loadAvg(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    def probe(): Double = {
      val t0 = System.nanoTime()
      spark.range(500000000L).selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // warm the JVM/codegen/parquet-footer paths so startup cost doesn't land
    // on whichever query happens to run first — all three hot tables, not
    // just lineitem (documents/embeddings footer reads were landing on the
    // alphabetically-first query that touched each)
    spark.range(1000).selectExpr("sum(id)").collect()
    // Per-query warmup pass (verdict r7 #6): rounds 6/7 ran byte-identical
    // binaries yet swung ±13× on individual queries (q_gopher_rules
    // 0.84→10.88 s) — JIT compilation, codegen caching, parquet page-cache
    // faults, and one-time registry index builds were landing on whichever
    // timed pass hit them first. Modes (SPARK_GRAFT_WARMUP):
    //  "1" (default) — run each query once untimed, report the timed
    //      steady-state second pass;
    //  "light" (verdict r12 #6) — CONSTRUCT each query's DataFrame and
    //      force its physical plan + codegen compile (queryExecution.toRdd
    //      builds the RDD lineage and compiles generated code WITHOUT
    //      running a job), but skip the untimed execution. One-time
    //      registry builds, disk layouts, and shared cached frames are
    //      eager side effects of construction, so they stay absorbed in
    //      warmup; Janino's generated-source cache makes the timed pass's
    //      own compile nearly free. The timed pass still RECONSTRUCTS the
    //      frame (construction-eager queries — driver walks, the evaluate
    //      grid — do their work at fn() time; reusing the warmed frame
    //      would report ~0 s for them). ~35% less total wall;
    //  "0" — single-pass cold numbers.
    val warmupMode = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1")
    val tables =
      if (warmupMode == "light")
        // no untimed execution will fault data pages into the OS page
        // cache, so materialize EVERY table fully up front
        new java.io.File(sfDir).listFiles()
          .filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq.sorted
      else Seq("lineitem.parquet", "documents.parquet", "embeddings.parquet")
    tables.foreach { tbl =>
      val t = spark.read.parquet(s"$sfDir/$tbl")
      if (warmupMode == "light") t.queryExecution.toRdd.foreach(_ => ())
      else t.limit(10).count()
    }
    val probeStart = probe()
    val loadStart = loadAvg()
    val gcStart = gcMs()
    // SPARK_GRAFT_ONLY=q_a,q_b restricts the run to named queries — the
    // targeted perf loop (iterate on one query's plan without paying the
    // full-surface wall). Never set on driver/artifact runs.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // warmup wall is measured and reported separately (advice r13: warmup
    // is INTERLEAVED with the timed passes, so the probe pair necessarily
    // brackets both — warmup_sec plus the mid-run probe below let a load
    // transient be attributed instead of skewing the inferred ambient
    // factor for the timed numbers)
    var warmupNanos = 0L
    val toRun = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // Opt-in upfront pool-parallel warmup (r19, verdict r18 #5 — see the
    // builder comment above for why it is NOT the default): one-time
    // registry/disk-layout builds overlap four at a time on local[32].
    // Correctness under concurrency: every shared artifact lives in a
    // per-(session, key) TrieMap whose getOrElseUpdate is atomic per
    // key — two queries racing a key both observe the single stored
    // instance (a losing thunk's build is discarded work, deterministic
    // by seeding) — and mutation riders own their layouts under private
    // keys. The timed pass stays strictly SEQUENTIAL either way.
    if (warmupMode != "0" && warmupPar > 1) {
      val w0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(warmupPar)
      try {
        toRun.map { case (_, fn) =>
          pool.submit(new Runnable {
            def run(): Unit =
              // NonFatal only (advice r8): a warmup OOM/VM error must
              // fail loudly, not leave the timed pass silently degraded
              try {
                val rdd = fn(spark, sfDir).queryExecution.toRdd // + codegen
                if (warmupMode != "light") rdd.foreach(_ => ())
              } catch { case scala.util.control.NonFatal(_) => () }
          })
        }.foreach(_.get()) // a fatal error re-surfaces here and aborts
      } finally pool.shutdown()
      warmupNanos = System.nanoTime() - w0
    }
    var probeMid = -1.0
    val results = toRun.zipWithIndex.map { case ((name, fn), qi) =>
      if (qi == toRun.size / 2) probeMid = probe()
      if (warmupMode != "0" && warmupPar <= 1) {
        // default interleaved warmup: warm each query IMMEDIATELY before
        // timing it (verdict r7 #6) — JIT, codegen cache, page cache and
        // one-time builds land here, adjacent to the measurement
        val w0 = System.nanoTime()
        try {
          val rdd = fn(spark, sfDir).queryExecution.toRdd // plan + codegen
          if (warmupMode != "light") rdd.foreach(_ => ())
        } catch { case scala.util.control.NonFatal(_) => () } // re-surfaces timed
        warmupNanos += System.nanoTime() - w0
      }
      val train0 = graft.core.BuildCounters.trainings.get()
      val t0 = System.nanoTime()
      // materialize every column (count() would let Catalyst prune the
      // projections and under-measure projection-heavy queries)
      val ok = try { fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ()); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      val trained = graft.core.BuildCounters.trainings.get() - train0
      (name, (System.nanoTime() - t0) / 1e9, ok, trained)
    }
    // The driver keeps only a ~2000-char stdout tail; at 105 queries the
    // full per-query map is ~2300 chars and truncating the line's HEAD made
    // it unparseable (BENCH_r10 parsed:null). Ship the headline + slowest-20
    // map on stdout (always < 2000 chars) and the complete per-query map to
    // BENCH_FULL.json for the judge.
    def sec(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def qmap(rs: Seq[(String, Double, Boolean, Long)]): String =
      rs.map { case (k, v, _, _) => "\"" + k + "\":" + sec(v) }
        .mkString("{", ",", "}")
    val failed = results.filterNot(_._3).map("\"" + _._1 + "\"")
      .mkString("[", ",", "]")
    // index trainings that leaked into a TIMED run (must be empty: every
    // one-time build belongs to warmup/construction — a non-empty map here
    // is the eviction/re-train smoking gun the r12 verdict asked for)
    val timedTrainings = results.filter(_._4 > 0)
      .map { case (k, _, _, n) => "\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val probeEnd = probe()
    val calib =
      s""""calibration":{"probe_start_sec":${sec(probeStart)},""" +
      s""""probe_mid_sec":${sec(probeMid)},""" +
      s""""probe_end_sec":${sec(probeEnd)},"gc_ms":${gcMs() - gcStart},""" +
      s""""warmup_sec":${sec(warmupNanos / 1e9)},""" +
      s""""load_avg_start":${"%.2f".formatLocal(java.util.Locale.ROOT, loadStart)},""" +
      s""""load_avg_end":${"%.2f".formatLocal(java.util.Locale.ROOT, loadAvg())},""" +
      s""""cpus":"$cpus","warmup":"$warmupMode",""" +
      s""""timed_trainings":$timedTrainings}"""
    val total = results.map(_._2).sum
    val slowest = results.sortBy(-_._2).take(20).sortBy(_._1)
    val line =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","n_queries":${results.size},"queries":${qmap(slowest)},"failed":$failed,$calib,"sf":"$sfDir"}"""
    val fullLine =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":${qmap(results)},"failed":$failed,$calib,"sf":"$sfDir"}"""
    val fullOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/BENCH_FULL.json")
    try {
      val w = new java.io.PrintWriter(fullOut, "UTF-8")
      try w.println(fullLine) finally w.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    // SPARK_GRAFT_HEAP_PROBE=1: after the full run, force a collection and
    // print the live-object class histogram — the instrument behind the
    // heap-cliff investigation (verdict r11 #1: the forked-JVM -Xmx the
    // bench needs has tracked query count 8g→80g; this shows WHAT is
    // retained once all 180 queries have run).
    if (sys.env.getOrElse("SPARK_GRAFT_HEAP_PROBE", "0") == "1") {
      System.gc(); Thread.sleep(2000); System.gc()
      val rt = Runtime.getRuntime
      System.err.println(f"[heap-probe] retained after GC: " +
        f"${(rt.totalMemory - rt.freeMemory) / 1e9}%.2f GB")
      try {
        val server = java.lang.management.ManagementFactory.getPlatformMBeanServer
        val objName = new javax.management.ObjectName(
          "com.sun.management:type=DiagnosticCommand")
        val histo = server.invoke(objName, "gcClassHistogram",
          Array[Object](null), Array("[Ljava.lang.String;")).asInstanceOf[String]
        System.err.println(histo.linesIterator.take(60).mkString("\n"))
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[heap-probe] histogram unavailable: $e") }
    }
    // stop() first: its shutdown logging must not land after the JSON line
    spark.stop()
    println(line)
    // artifact guard (verdict r11 #3): BENCH_r10.json shipped with a
    // non-empty failed list and an unparseable tail; a bench whose queries
    // failed must say so in its exit code, not just a JSON field
    if (results.exists(!_._3)) sys.exit(1)
  }
}
