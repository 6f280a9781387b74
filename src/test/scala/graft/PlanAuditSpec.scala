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
