package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join via bucketing — the scale-correct plan for joins
  * whose only predicate is a time/number range. A naive `a JOIN b ON b.ts
  * BETWEEN a.ts - w AND a.ts` has no equi-key, so Spark plans a broadcast
  * nested loop (or cartesian) — O(n·m) comparisons that no amount of
  * cluster survives. Bucketing by the window width turns it into an
  * equi-join: a right row's timestamp lands in exactly one bucket, a left
  * row's window `[t − w, t)` spans at most two, so exploding the left side
  * to its two candidate buckets and equi-joining on bucket generates every
  * qualifying pair exactly once (never twice: the right bucket is unique),
  * and the residual range predicate only filters within-bucket pairs.
  * Shuffle is keyed by bucket — partition-parallel, skew-bounded by how
  * many rows share a window-sized time slice.
  */
object RangeJoin {

  /** All pairs (left row, right row) with `right.rightTs ∈ [left.leftTs − w,
    * left.leftTs)` — "right points inside the left row's trailing window".
    * Column names of `left` and `right` must be disjoint.
    */
  def pointsInWindow(left: DataFrame, right: DataFrame, leftTs: String,
      rightTs: String, window: Long): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    val lb = left.withColumn("_lbucket", floor(col(leftTs) / window))
    val rb = right.withColumn("_rbucket", floor(col(rightTs) / window))
    lb.withColumn("_jbucket",
        explode(array(col("_lbucket") - 1, col("_lbucket"))))
      .drop("_lbucket")
      .join(rb, col("_jbucket") === col("_rbucket") &&
        col(rightTs) >= col(leftTs) - window && col(rightTs) < col(leftTs))
      .drop("_jbucket", "_rbucket")
  }
}
