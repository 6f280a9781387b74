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
  /** Raw pair distances. For metrics that are mathematically >= 0 the
    * clip-to-zero is applied here as fp-noise canonicalization (stabilizes
    * tie order); for InnerProduct the distance is genuinely signed, so
    * selection must rank the RAW value — the reference clips only the
    * final, already-sorted output (`vicinity.py:135`). */
  private def pairDistances(store: DataFrame, queries: DataFrame,
      metric: Metric, vecCol: String, qvecCol: String): DataFrame = {
    val raw = VectorFunctions.distance(metric)(col(vecCol), col(qvecCol))
    val d = if (metric == Metric.InnerProduct) raw else greatest(raw, lit(0.0))
    store.crossJoin(broadcast(queries))
      .select(col("query_id"), col("id"), d.as("dist"))
  }

  /** output clip ≙ `distances.clip(min=0)` after selection (vicinity.py:135) */
  private def clipOut(df: DataFrame): DataFrame =
    df.withColumn("dist", greatest(col("dist"), lit(0.0)))

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
      clipOut(TopK.topKPerGroup(pairs, Seq("query_id"), "id", "dist", k))
    } else {
      // reference plan for correctness cross-checks: full window sort
      val w = Window.partitionBy("query_id").orderBy(col("dist"), col("id"))
      clipOut(pairs.withColumn("rank", row_number().over(w))
        .where(col("rank") <= k))
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
      clipOut(TopK.topKPerGroup(pairs, Seq("query_id"), "id", "dist", maxK)
        .where(pred))
    } else {
      clipOut(pairs.where(pred))
    }
  }

  /** metrics the primitive blocked kernel can score */
  private val blockedMetrics = Set[Metric](Metric.Cosine, Metric.Euclidean,
    Metric.L2Squared, Metric.Manhattan, Metric.InnerProduct)

  /** Slice an id-keyed frame into ranges whose vector payload fits in
    * `targetBytes` of driver heap — the bounded-broadcast iterator behind
    * the big-store self-join paths. Boundaries come from approximate
    * quantiles, so slices stay balanced under skewed id gaps; returned as
    * (lo, hi, hiInclusive) predica­ble ranges covering every id exactly once.
    */
  private def idSlices(df: DataFrame, idCol: String, n: Long, dim: Int,
      targetBytes: Long): Seq[(Long, Long, Boolean)] = {
    val bytesPerRow = math.max(1L, dim * 8L)
    val rowsPerSlice = math.max(1L, targetBytes / bytesPerRow)
    val nSlices = math.max(1L, math.ceil(n.toDouble / rowsPerSlice).toLong).toInt
    if (nSlices == 1) return Seq((Long.MinValue, Long.MaxValue, true))
    val probs = (0 to nSlices).map(_.toDouble / nSlices).toArray
    val bounds = df.stat.approxQuantile(idCol, probs, 0.001).map(_.toLong)
    (0 until nSlices).flatMap { i =>
      val lo = if (i == 0) Long.MinValue else bounds(i)
      val hi = if (i == nSlices - 1) Long.MaxValue else bounds(i + 1)
      val last = i == nSlices - 1
      // duplicate quantile boundaries yield empty slices — drop them
      if (!last && lo >= hi) None else Some((lo, hi, last))
    }
  }

  /** k-NN self-join: for every row of `df`, its k nearest *other* rows.
    * The all-pairs similarity-join workhorse (dedup, graph building).
    *
    * Scale shape: the store side never shuffles or broadcasts. The QUERY
    * side is what must reach the driver for the blocked kernel, so when its
    * payload exceeds `broadcastBytes` it is iterated in bounded id-range
    * slices — each slice broadcast, scored by the blocked kernel, and the
    * per-query results unioned (each query's top-k is complete within its
    * own slice, so the union is exact). An exact self-join is O(n²) compute
    * regardless; this bounds MEMORY at any n — the compute-scale path is
    * LSH/IVF candidate blocking.
    */
  def selfJoin(df: DataFrame, k: Int, metric: Metric,
      vecCol: String = "vector",
      broadcastBytes: Long = 256L * 1024 * 1024): DataFrame = {
    val queries = df.select(col("id").as("query_id"), col(vecCol).as("qvector"))
    val store = df.select(col("id"), col(vecCol).as("vector"))
    // gate on estimated BYTES (n·dim·8), not row count: 100k rows of
    // 1536-dim embeddings is ~1.2 GB of driver heap, not one broadcast
    val n = df.count()
    val dim = if (n == 0) 0 else df.select(size(col(vecCol))).head.getInt(0)
    val slices =
      if (n * dim * 8L <= broadcastBytes) Seq((Long.MinValue, Long.MaxValue, true))
      else idSlices(df, "id", n, dim, broadcastBytes)
    slices.map { case (lo, hi, hiInclusive) =>
      val qSlice = queries.where(col("query_id") >= lo &&
        (if (hiInclusive) col("query_id") <= hi else col("query_id") < hi))
      if (blockedMetrics.contains(metric)) {
        queryBlocked(store, qSlice, k, metric, excludeSelf = true)
      } else {
        // non-primitive metrics (hamming/tanimoto): codegen'd Column kernel
        // over a broadcast slice — still no full-table broadcast
        val raw = VectorFunctions.distance(metric)(col("vector"), col("qvector"))
        val d = if (metric == Metric.InnerProduct) raw else greatest(raw, lit(0.0))
        val pairs = store.crossJoin(broadcast(qSlice))
          .where(col("id") =!= col("query_id"))
          .select(col("query_id"), col("id"), d.as("dist"))
        clipOut(TopK.topKPerGroup(pairs, Seq("query_id"), "id", "dist", k))
      }
    }.reduce(_ unionByName _)
  }

  /** All-pairs-under-threshold self-join: (i, j, dist) for every unordered
    * pair with `dist < threshold` (strict) and `i < j` — the exact
    * embedding-near-dup operator.
    *
    * Candidate-free by design: at a LOW similarity threshold (here the
    * interesting pairs sit at cosine ≈ 0.45–0.55 similarity, the ~3σ tail
    * of the background distribution) sign-LSH banding cannot prune — at the
    * boundary the per-hyperplane agreement is only ≈ 0.65, so a miss
    * probability under 1e-4 needs hundreds of tables whose bucket
    * collisions cost MORE than scanning all pairs (contrast
    * `Dedup.minhashDedup`, which bands at Jaccard 0.7 where amplification
    * works). The scale-correct exact plan is this blocked kernel: no join-row
    * materialization, no cartesian in the physical plan, query side
    * iterated in bounded broadcast slices, emitted rows only the matches.
    */
  def thresholdSelfJoin(df: DataFrame, threshold: Double, metric: Metric,
      vecCol: String = "vector",
      broadcastBytes: Long = 256L * 1024 * 1024): DataFrame = {
    require(blockedMetrics.contains(metric),
      s"thresholdSelfJoin does not support metric ${metric.name}")
    val spark = df.sparkSession
    val store = df.select(col("id").cast("long"), col(vecCol).cast("array<double>"))
    val n = df.count()
    val dim = if (n == 0) 0 else df.select(size(col(vecCol))).head.getInt(0)
    val slices =
      if (n * dim * 8L <= broadcastBytes) Seq((Long.MinValue, Long.MaxValue, true))
      else idSlices(df, "id", n, dim, broadcastBytes)
    val m = metric
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("dist",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    slices.map { case (lo, hi, hiInclusive) =>
      val qRows = store.where(col("id") >= lo &&
          (if (hiInclusive) col("id") <= hi else col("id") < hi))
        .collect()
      val qIds = qRows.map(_.getLong(0))
      val qVecs = qRows.map(_.getSeq[Double](1).toArray)
      val bc = spark.sparkContext.broadcast((qIds, qVecs))
      val matches = store.rdd.mapPartitions { rows =>
        val (ids, vecs) = bc.value
        rows.flatMap { r =>
          val id = r.getLong(0)
          val v = r.getSeq[Double](1).toArray
          val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
          var qi = 0
          while (qi < vecs.length) {
            if (ids(qi) < id) { // unordered pairs once: i < j
              val dist = scoreVec(m, v, vecs(qi))
              if (dist < threshold)
                out += org.apache.spark.sql.Row(ids(qi), id, math.max(dist, 0.0))
            }
            qi += 1
          }
          out
        }
      }
      spark.createDataFrame(matches, schema)
    }.reduce(_ unionByName _)
  }

  /** primitive-loop distance for the blocked kernels */
  private def scoreVec(m: Metric, v: Array[Double], q: Array[Double]): Double = {
    var acc = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    m match {
      case Metric.Cosine =>
        while (i < v.length) {
          acc += v(i) * q(i); na += v(i) * v(i); nb += q(i) * q(i); i += 1
        }
      case Metric.Euclidean | Metric.L2Squared =>
        while (i < v.length) { val d = v(i) - q(i); acc += d * d; i += 1 }
      case Metric.Manhattan =>
        while (i < v.length) { acc += math.abs(v(i) - q(i)); i += 1 }
      case Metric.InnerProduct =>
        while (i < v.length) { acc += v(i) * q(i); i += 1 }
      case other => throw new IllegalArgumentException(
        s"blocked kernel does not support metric ${other.name}")
    }
    m match {
      case Metric.Cosine =>
        val denom = math.sqrt(na) * math.sqrt(nb)
        if (denom == 0) 1.0 else 1.0 - acc / denom
      case Metric.Euclidean => math.sqrt(math.max(acc, 0.0))
      case Metric.InnerProduct => 1.0 - acc
      case _ => acc
    }
  }

  /** Blocked exact kNN for LARGE query batches — the scale path when the
    * n×q pair space is too big to materialize as join rows (the crossJoin
    * plan streams every (store row, query) pair through the aggregate; at
    * q in the thousands that is billions of rows).
    *
    * Physical shape, mirroring the reference's batched BLAS kernel
    * (`/root/reference/vicinity/backends/basic.py:190-207`) on Spark terms:
    * queries are collected to a primitive matrix and broadcast; each store
    * partition scans its rows once, scoring all queries per row in a tight
    * primitive loop and maintaining one bounded heap per query; each
    * partition emits only its q×k survivors, which a final per-query top-k
    * merges. Shuffle volume: q × k × partitions rows, independent of n.
    *
    * `excludeSelf` drops candidate id == query id (self-join semantics).
    */
  def queryBlocked(store: DataFrame, queries: DataFrame, k: Int,
      metric: Metric, vecCol: String = "vector", qvecCol: String = "qvector",
      excludeSelf: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = store.sparkSession
    import graft.functions.TopKHeap
    val qRows = queries
      .select(col("query_id").cast("long"),
        col(qvecCol).cast("array<double>"))
      .collect()
    val qIds = qRows.map(_.getLong(0))
    val qVecs = qRows.map(_.getSeq[Double](1).toArray)
    val bc = spark.sparkContext.broadcast((qIds, qVecs))
    val m = metric
    val partials = store
      .select(col("id").cast("long"), col(vecCol).cast("array<double>"))
      .rdd.mapPartitions { rows =>
        val (ids, vecs) = bc.value
        val heaps = Array.fill(ids.length)(new TopKHeap(k))
        rows.foreach { r =>
          val id = r.getLong(0)
          val v = r.getSeq[Double](1).toArray
          var qi = 0
          while (qi < vecs.length) {
            if (!(excludeSelf && ids(qi) == id)) {
              val dist = scoreVec(m, v, vecs(qi))
              // canonicalize fp noise for non-negative metrics; keep the
              // signed value for InnerProduct (clip happens on output)
              val d2 = if (m == Metric.InnerProduct) dist else math.max(dist, 0.0)
              heaps(qi).add(id, d2)
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.sorted.map(n => org.apache.spark.sql.Row(ids(qi), n.id, n.dist))
        }
      }
    val partialDf = spark.createDataFrame(partials,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("query_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("dist",
          org.apache.spark.sql.types.DoubleType, nullable = false))))
    clipOut(TopK.topKPerGroup(partialDf, Seq("query_id"), "id", "dist", k))
  }
}
