package graft

import org.apache.spark.sql.functions._

/** Executable evidence for the 100 TB design claims: bucketed co-located
  * joins eliminate the shuffle, and salting splits skewed aggregation keys
  * without changing results.
  */
class ScaleDesignSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val li = sf("lineitem", "/root/testdata/sf0.001")
    val ord = sf("orders", "/root/testdata/sf0.001")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("ord_bucketed"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy("o_orderstatus").agg(sum("l_quantity"))
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: the join itself requires no shuffle of either side
    // (the only exchange allowed is the final small aggregation)
    val joinSection = plan.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
      s"join shuffled a bucketed side:\n$plan")
    assert(joined.collect().nonEmpty)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
  }

  test("salted two-phase aggregation matches direct aggregation on skewed keys") {
    // skew: 90% of rows share one key
    val skewed = spark.range(100000)
      .select(when($"id" % 10 === 0, $"id" % 7).otherwise(0L).as("k"),
        ($"id" % 100).cast("double").as("v"))
    val direct = skewed.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    // phase 1: aggregate on (k, salt); phase 2: merge partials per k
    val salted = skewed
      .withColumn("salt", pmod(crc32($"v".cast("string")), lit(16)))
      .groupBy("k", "salt").agg(sum("v").as("ps"), count(lit(1)).as("pn"))
      .groupBy("k").agg(sum("ps").as("s"), sum("pn").as("n"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n === direct(k)._2)
      assert(math.abs(s - direct(k)._1) < 1e-6)
    }
  }
}
