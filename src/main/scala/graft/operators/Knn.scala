package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.{TopK, VectorFunctions}

/** Exact (brute-force) k-NN and radius queries — the Spark-native equivalent
  * of the reference's BASIC backend (`/root/reference/vicinity/backends/
  * basic.py:149-207`) and the `query`/`query_threshold` entry points
  * (`/root/reference/vicinity/vicinity.py:114-165`).
  *
  * Physical shape (designed for a large store, small-to-medium query batch):
  * store never shuffles — queries are broadcast, the distance kernel runs
  * inside whole-stage codegen over the store scan, and per-query top-k is a
  * partial aggregate (map-side bounded heap; see [[graft.functions.TopKHeap]]),
  * so the only shuffled rows are `k × partitions` per query.
  */
object Knn {

  /** Broadcast-join each query against the full store and compute distance.
    * `store` must have (`id`, `vecCol`); `queries` must have (`query_id`,
    * `qvecCol`). Output: query_id, id, dist (clipped ≥ 0 per
    * `vicinity.py:135`).
    */
  private def pairDistances(store: DataFrame, queries: DataFrame,
      metric: Metric, vecCol: String, qvecCol: String): DataFrame = {
    val d = VectorFunctions.distance(metric)(col(vecCol), col(qvecCol))
    store.crossJoin(broadcast(queries))
      .select(col("query_id"), col("id"),
        greatest(d, lit(0.0)).as("dist"))
  }

  /** Top-k per query: (query_id, id, dist, rank), rank 1-based by (dist, id).
    * `effective k = min(k, store size)` falls out naturally (a heap over
    * fewer than k candidates just returns them all — `basic.py:192` parity).
    */
  def query(store: DataFrame, queries: DataFrame, k: Int, metric: Metric,
      vecCol: String = "vector", qvecCol: String = "qvector",
      useAggregator: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k") // basic.py:187-188
    val pairs = pairDistances(store, queries, metric, vecCol, qvecCol)
    if (useAggregator) {
      TopK.topKPerGroup(pairs, Seq("query_id"), "id", "dist", k)
    } else {
      // reference plan for correctness cross-checks: full window sort
      val w = Window.partitionBy("query_id").orderBy(col("dist"), col("id"))
      pairs.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
    }
  }

  /** Radius query: all pairs with dist <= threshold (exact-backend inclusive
    * semantics, `basic.py:168`; ANN backends use strict `<` — pass
    * `inclusive = false` for that). `maxK` caps candidates per query like the
    * ANN paths' top-max_k pre-truncation (`vicinity.py:140-165`); pass
    * `maxK <= 0` for uncapped exact semantics.
    */
  def queryThreshold(store: DataFrame, queries: DataFrame, threshold: Double,
      metric: Metric, maxK: Int = 0, inclusive: Boolean = true,
      vecCol: String = "vector", qvecCol: String = "qvector"): DataFrame = {
    val pairs = pairDistances(store, queries, metric, vecCol, qvecCol)
    val pred: Column =
      if (inclusive) col("dist") <= threshold else col("dist") < threshold
    if (maxK > 0) {
      // ANN emulation: truncate to max_k nearest, then filter
      TopK.topKPerGroup(pairs, Seq("query_id"), "id", "dist", maxK).where(pred)
    } else {
      pairs.where(pred)
    }
  }

  /** k-NN self-join: for every row of `df`, its k nearest *other* rows.
    * The all-pairs similarity-join workhorse (dedup, graph building).
    */
  def selfJoin(df: DataFrame, k: Int, metric: Metric,
      vecCol: String = "vector"): DataFrame = {
    val queries = df.select(col("id").as("query_id"), col(vecCol).as("qvector"))
    val store = df.select(col("id"), col(vecCol))
    val d = VectorFunctions.distance(metric)(col(vecCol), col("qvector"))
    val pairs = store.crossJoin(broadcast(queries))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"))
    TopK.topKPerGroup(pairs, Seq("query_id"), "id", "dist", k)
  }
}
