package graft

/** Regression net over the ENTIRE query surface: no declared query may plan
  * a CartesianProduct. Broadcast nested-loop joins over genuinely tiny
  * frames (a 1-row count, an 8-row pair grid) are fine — CartesianProduct
  * is the operator Spark picks when BOTH sides are too big to broadcast,
  * i.e. exactly the plan that detonates at 100 TB.
  */
class PlanAuditSpec extends SparkSpec {

  test("no query in the surface plans a CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = Queries.all.flatMap { q =>
      val plan =
        try Queries.queryMap(q.name)(spark, dir)
          .queryExecution.executedPlan.toString
        catch { case e: Throwable =>
          fail(s"${q.name} failed to plan: ${e.getMessage}") }
      if (plan.contains("CartesianProduct")) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian plans in: ${offenders.mkString(", ")}")
  }

  test("no query plans an UNPARTITIONED Window (single-partition global sort)") {
    // the r7->r8 class of scale killer, as a surface-wide net: a physical
    // WindowExec with an empty partition spec funnels every row through one
    // partition. Plan strings print `Window [functions], [partitionSpec],
    // [orderSpec]` but OMIT empty spec groups, so group count alone cannot
    // distinguish partitioned-unordered (2 groups, benign) from
    // unpartitioned-ordered (2 groups, the killer). Discriminator: order
    // specs carry ASC/DESC sort directions, partition specs are bare
    // attributes — so the offender shapes are exactly
    //   1 group              (both specs empty: global whole-frame window)
    //   2 groups, last has ASC|DESC  (global ordered window / global rank)
    val dir = "/root/testdata/sf0.001"
    val offenders = Queries.all.flatMap { q =>
      val plan = Queries.queryMap(q.name)(spark, dir)
        .queryExecution.executedPlan.toString
      val bad = plan.linesIterator.exists { line =>
        val i = line.indexOf("Window [")
        if (i < 0) false
        else {
          val groups = line.substring(i).split("\\], \\[")
          groups.length == 1 ||
            (groups.length == 2 &&
              (groups.last.contains(" ASC") || groups.last.contains(" DESC")))
        }
      }
      if (bad) Some(q.name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window in: ${offenders.mkString(", ")}")
  }

  test("no hinted broadcast of an unbounded base-table frame") {
    // verdict r8 #1 as a surface-wide net: a forced broadcast() hint on a
    // frame whose cardinality grows with the corpus (a store-sized
    // projection, a vocabulary-sized aggregate) bypasses Spark's size check
    // and OOMs the driver at 100×. Discriminator for FORCED hints: plan with
    // autoBroadcastJoinThreshold=-1 — the planner then never broadcasts on
    // its own size estimates (which at sf0.001 would legitimately broadcast
    // almost anything), so every surviving BroadcastExchange comes from an
    // explicit hint. Each such exchange whose build subtree reads the
    // documents/embeddings base tables must contain a row-limiting operator
    // between scan and exchange: a scalar aggregate (keys=[], 1 row), the
    // TopK bounded heap, an explicit Limit, or a literal-comparison filter
    // on the scan (a key-range/key-list gate like `vec_id < 50`). Aggregates
    // keyed on data-derived columns (keys=[w]) and bare projections do NOT
    // qualify — those are exactly the vocab-count and store-label shapes
    // this net exists to catch.
    val dir = "/root/testdata/sf0.001"
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val offenders = Queries.all.flatMap { q =>
        val plan = Queries.queryMap(q.name)(spark, dir)
          .queryExecution.executedPlan.toString
        unboundedHintedBroadcasts(plan).map(d => s"${q.name}: $d")
      }
      assert(offenders.isEmpty,
        s"unbounded hinted broadcasts:\n${offenders.mkString("\n")}")
    } finally spark.conf.set(key, prev)
  }

  /** Node text column in a plan-tree line (tree-drawing prefix chars are
    * spaces, ':', '+', '-'); -1 (blank line) sorts as depth 0 so subtree
    * scans stop there. */
  private def indentOf(line: String): Int =
    line.indexWhere(c => !" :+-".contains(c))

  /** True iff some ancestor of line `i` (the chain of lines above with
    * strictly smaller indent) is an InMemoryRelation/InMemoryTableScan.
    * Cached intermediates embed the physical plan they were built with,
    * planned under the AMBIENT broadcast threshold at materialization time —
    * a BroadcastExchange in there is a size-checked planner choice (re-made
    * by AQE at real scale), not a forced hint, so it is out of scope for
    * this net. (Hints inside cached builds would also surface here on a
    * cold session; the source-level guarantee is that prep/Dedup.scala
    * contains no broadcast() calls.) */
  private def underCachedPlan(lines: Vector[String], i: Int): Boolean = {
    var j = i - 1
    var cur = indentOf(lines(i))
    while (j >= 0 && cur > 0) {
      val ij = indentOf(lines(j))
      if (ij >= 0 && ij < cur) {
        if (lines(j).contains("InMemoryRelation") ||
            lines(j).contains("InMemoryTableScan")) return true
        cur = ij
      }
      j -= 1
    }
    false
  }

  /** First line of each BroadcastExchange build subtree that reads the
    * documents/embeddings base tables with no row-limiting operator in
    * between. */
  private def unboundedHintedBroadcasts(plan: String): Seq[String] = {
    val limiter = Seq(
      "keys=\\[\\]",                       // scalar agg -> 1 row
      "topk",                              // bounded-heap top-k agg
      "GlobalLimit|LocalLimit|CollectLimit|TakeOrderedAndProject",
      // literal comparison on a KNOWN key/selective column (doc_id/vec_id
      // point or range selections; term = the 3-word query-term selection
      // bounding bm25/rrf's dfreq), post-scan or pushed into the scan —
      // restricting to named columns keeps incidental guards like
      // size(shingles) > 0 or n_chars > 0 from counting as row-limiting
      // (advice r9: those don't bound the frame)
      "Filter .*(doc_id|vec_id|term)#\\d+L? (<=?|>=?|=) -?\\d",
      "PushedFilters: .*(LessThan|GreaterThan|EqualTo|In)\\((doc_id|vec_id|term)",
      // a `term` field generated from a LITERAL struct array (bm25/rrf's
      // fixed query terms): the downstream keys=[term] aggregate emits at
      // most one row per array literal, bounding the frame at any corpus
      // size regardless of incidental tf > 0 guards
      "Generate explode\\(array\\(struct\\(term, ").map(_.r)
    val lines = plan.linesIterator.toVector
    lines.indices.flatMap { i =>
      if (!lines(i).contains("BroadcastExchange") ||
          underCachedPlan(lines, i)) None
      else {
        val ind = indentOf(lines(i))
        val sub = lines.drop(i + 1)
          .takeWhile(l => indentOf(l) > ind)
        val readsBase = sub.exists(l =>
          l.contains("documents") || l.contains("embeddings"))
        val limited = sub.exists(l => limiter.exists(_.findFirstIn(l).isDefined))
        if (readsBase && !limited)
          Some(sub.headOption.getOrElse("?").trim.take(100))
        else None
      }
    }
  }

  test("q_bm25 / q_rrf_fusion rank without any Window operator") {
    // verdict r7 #2 regression guard: both queries used to rank through an
    // unpartitioned Window.orderBy — a single-partition sort of every
    // per-doc score. They now rank through the TopK bounded-heap aggregate
    // (constant group key, map-side partial), so the physical plan must
    // contain ZERO Window operators of any kind.
    val dir = "/root/testdata/sf0.001"
    Seq("q_bm25", "q_rrf_fusion").foreach { name =>
      val plan = Queries.queryMap(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"),
        s"$name plans a Window operator again")
      assert(plan.contains("topk_neighbors"),
        s"$name no longer ranks through the TopK aggregate")
    }
  }
}
