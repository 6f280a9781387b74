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
