package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.{TopK, VectorFunctions}

/** IVF (inverted-file) strategy ≙ the reference's FAISS `ivf*` index family
  * (`/root/reference/vicinity/backends/faiss.py:101-118`): train a KMeans
  * codebook (MLlib — the "MLlib for batch vector index building" north
  * star), assign every store row to its nearest centroid, and at query time
  * search only the `nprobe` nearest cells.
  *
  * Scale story (SURVEY.md §4): the prepared store carries a `_centroid`
  * column; persisted indexes are partitioned by it, so the `isin(probes)`
  * filter becomes Parquet partition pruning — a query touches nprobe/nlist
  * of the data. Cosine is served as inner-product over pre-normalized
  * vectors, exactly like FAISS (`faiss.py:49-52`, `82-83`).
  *
  * Insert assigns new rows to existing centroids without retraining
  * (≙ FAISS `add` after `train`); delete is unsupported (`faiss.py:163-165`).
  */
case class IvfStrategy(metric: Metric, nlist: Int = 100, nprobe: Int = 4,
    seed: Long = 42L) extends IndexStrategy with DiskServing {
  require(metric == Metric.Cosine || metric == Metric.Euclidean,
    s"Metric '${metric.name}' is not supported by the IVF backend.")
  val name = "ivf"

  /** trained codebook, set during prepare (deterministic: fixed seed) */
  @transient private var centroids: Array[Array[Double]] = _

  /** composition hooks for strategies layering codes over IVF cells */
  private[graft] def centroidArray: Array[Array[Double]] = centroids
  private[graft] def isTrained: Boolean = centroids != null

  /** Adopt an already-trained codebook instead of retraining — the
    * build-once registry story extended to composed strategies. ONLY valid
    * for a codebook trained with identical (store, nlist, seed): training
    * is deterministic, so the adopted centroids equal what this instance
    * would have trained, bitwise — adoption changes cost, never results
    * (spec-asserted). */
  private[graft] def adoptCentroids(c: Array[Array[Double]]): Unit = {
    require(c != null && c.nonEmpty && c.length <= nlist,
      s"adopted codebook must have 1..$nlist centroids, got " +
        s"${if (c == null) "null" else c.length.toString}")
    centroids = c
  }

  private def nearestCentroidsUdf(cents: Array[Array[Double]], n: Int) =
    udf { (v: Seq[Double]) =>
      val arr = v.toArray
      val dists = cents.map { c =>
        var s = 0.0
        var i = 0
        while (i < arr.length) { val d = arr(i) - c(i); s += d * d; i += 1 }
        s
      }
      dists.zipWithIndex.sortBy(_._1).take(n).map(_._2)
    }

  /** rows used to train the codebook; assignment still covers every row
    * (FAISS trains on a sample too — training cost must not scale with the
    * store) */
  private val maxTrainRows = 100000L

  /** below this many sample ELEMENTS (rows × dim ≤ 32 MB of doubles) the
    * codebook trains with driver-side seeded Lloyd's — one collect instead
    * of ~10 distributed jobs whose scheduling overhead dwarfs the math on
    * small data. Larger samples keep the MLlib path, which distributes the
    * assignment step (a 100k × 1536-dim capped sample is real compute). */
  private val smallTrainElems = 4L << 20

  def prepare(store: DataFrame): DataFrame = {
    val normed = maybeNormalize(store, "vector")
    if (centroids == null) {
      // train the codebook (skipped when loadAux restored one)
      val n = store.count()
      // an empty train set must fail loudly (as FAISS `train` and MLlib
      // KMeans.fit do): silently training zero centroids would leave
      // isTrained == true and later inserts assigned to a null cell that
      // no probe list ever selects
      require(n > 0, "cannot train an IVF codebook on an empty store")
      graft.core.BuildCounters.trainings.incrementAndGet()
      val k = math.min(nlist, math.max(1, n.toInt))
      val dim = if (n == 0) 1 else normed.select(size(col("vector"))).head.getInt(0)
      if (n * dim <= smallTrainElems) {
        val pts = normed.orderBy("id").select("vector")
          .collect().map(_.getSeq[Double](0).toArray)
        centroids = PqCore.kmeans(pts, k, iters = 10, new scala.util.Random(seed))
      } else {
        val feat = normed.select(array_to_vector(col("vector")).as("features"))
        val trainSet =
          if (n > maxTrainRows) feat.sample(maxTrainRows.toDouble / n, seed)
          else feat
        val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10)
          .setFeaturesCol("features").setPredictionCol("_centroid")
          .fit(trainSet)
        centroids = model.clusterCenters.map(_.toArray)
      }
    }
    if (store.columns.contains("_centroid")) normed // restored from index
    else normed.withColumn("_centroid",
      nearestCentroidsUdf(centroids, 1)(col("vector")).getItem(0))
  }

  /** new rows are assigned to the EXISTING codebook — FAISS `add` after
    * `train` (`faiss.py:157-161`), no retraining */
  override def prepareIncrement(prevPrepared: DataFrame, newRows: DataFrame,
      fullStore: DataFrame): DataFrame =
    if (centroids == null) prepare(fullStore)
    else prevPrepared.unionByName(prepare(newRows))

  override def saveAux(dir: String): Unit = {
    require(centroids != null, "nothing to save before prepare")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("nlist", nlist); root.put("nprobe", nprobe); root.put("seed", seed)
    val arr = root.putArray("centroids")
    centroids.foreach { c =>
      val row = arr.addArray(); c.foreach(row.add)
    }
    graft.core.FsIO.write(s"$dir/centroids.json", mapper.writeValueAsString(root))
  }

  override def loadAux(dir: String): Unit = {
    if (graft.core.FsIO.exists(s"$dir/centroids.json")) {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(graft.core.FsIO.read(s"$dir/centroids.json"))
      val arr = root.get("centroids")
      centroids = (0 until arr.size()).map { i =>
        val row = arr.get(i)
        (0 until row.size()).map(j => row.get(j).asDouble()).toArray
      }.toArray
    }
  }

  /** index laid out by cell: `isin(probes)` filters become Parquet
    * partition pruning at query time */
  override def writeIndex(prepared: DataFrame, path: String): Unit =
    prepared.write.mode("overwrite").partitionBy("_centroid").parquet(path)

  /** Disk-resident serving: answer top-k from the cell-partitioned parquet
    * layout [[writeIndex]] wrote, scanning ONLY the probed cells. The
    * distinct union of the batch's probe cells becomes a `_centroid IN`
    * predicate the scan resolves at the DIRECTORY level (Parquet partition
    * pruning — spec-asserted on the physical plan), so a query batch reads
    * ~nprobe/nlist of the index from storage: FAISS's inverted-list
    * pruning, served by the storage layer with NO resident index and no
    * warm-up scan. This is the 100 TB serving shape — the index lives as a
    * partitioned table, executors read only probed cells, and per-query
    * cell matching happens in the same broadcast equi-join as the
    * in-memory path, so results are identical to [[query]] on the
    * prepared frame (spec-pinned). */
  override def queryFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int): DataFrame = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    val pruned = spark.read.parquet(path)
      .where(col("_centroid").isInCollection(probeCells(queries)))
    query(pruned, queries, k)
  }

  /** Filtered ANN off the disk layout — the "filtered vector search"
    * shape: a metadata predicate composed with the probe pruning, with
    * PRE-filter semantics (the q_knn_filtered convention: the predicate
    * lands before the kernel, so k results survive arbitrarily selective
    * filters — post-filtering a top-k can return fewer). Both reductions
    * reach the parquet reader: the probe IN-list prunes cell DIRECTORIES
    * and a simple-comparison predicate lands in PushedFilters to skip row
    * groups — at 100 TB a filtered query batch reads
    * ~nprobe/nlist × selectivity of the index and scores only survivors.
    * The metadata column rides in the index layout (prepare/writeIndex
    * pass extra store columns through untouched), so no side join is
    * needed at query time. */
  override def supportsDiskFiltered: Boolean = true
  override def queryFilteredFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int,
      predicate: org.apache.spark.sql.Column): DataFrame = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    val pruned = spark.read.parquet(path)
      .where(col("_centroid").isInCollection(probeCells(queries)))
      .where(predicate)
    query(pruned, queries, k)
  }

  /** [[queryFromDisk]] for the range-search entry point: same
    * partition-pruned scan, same FAISS strict-`<` threshold semantics as
    * [[queryThreshold]] — the disk-resident index serves BOTH query
    * shapes through one layout. */
  override def supportsDiskThreshold: Boolean = true
  override def queryThresholdFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, threshold: Double,
      maxK: Int): DataFrame = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    val pruned = spark.read.parquet(path)
      .where(col("_centroid").isInCollection(probeCells(queries)))
    queryThreshold(pruned, queries, threshold, maxK)
  }

  /** Partition-scoped DELETE on the disk-resident layout — the maintenance
    * op completing the serving story (append: `StreamOps.appendVectorsToIndex`,
    * compact: `StreamOps.compactIndex`, query/range: [[queryFromDisk]] /
    * [[queryThresholdFromDisk]]): remove rows by id, rewriting ONLY the
    * cells that contain them. Deletes arrive as `(id, vector)` — codebook
    * assignment is deterministic, so each delete's cell is COMPUTED from
    * its vector, never searched: no full-index scan, the read is
    * partition-pruned to the affected cells exactly like a query. At
    * 100 TB a delete batch touching c cells rewrites c/nlist of the index
    * and reads nothing else. Survivors land in a temp layout and swap in
    * per cell directory (the `compactIndex` idiom — never an in-place
    * overwrite of a path being read), which also handles the edge dynamic
    * partition overwrite silently skips: a cell emptied by the delete is
    * removed outright. Returns the number of rows removed. */
  override def supportsDiskDelete: Boolean = true
  override def deleteFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, deletes: DataFrame): Long = {
    require(centroids != null, "IvfStrategy.prepare must run before delete")
    val del = maybeNormalize(deletes, "vector")
      .select(col("id"),
        nearestCentroidsUdf(centroids, 1)(col("vector")).getItem(0)
          .as("_cell"))
    val cells = del.select("_cell").distinct().collect().map(_.getInt(0)).toSeq
    if (cells.isEmpty) 0L
    else {
      // the shared partition-scoped rewrite (review r14: this body WAS
      // the idiom PartitionRewrite was factored from, and the private
      // copy had already drifted — it lacked the leftover-temp pre-clear
      // and the rename-aside rollback the shared helper carries)
      val (before, after) = PartitionRewrite.dropIds(spark, path,
        "_centroid", cells, del.select("id"))
      before - after
    }
  }

  /** distinct union of every query's nprobe nearest cells — the static
    * pruning predicate for strategies that compose over IVF cells */
  def probeCells(queries: DataFrame): Seq[Int] = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    val q = maybeNormalize(queries, "qvector")
    val nprobeEff = math.min(nprobe, centroids.length)
    q.select(explode(nearestCentroidsUdf(centroids, nprobeEff)(col("qvector"))))
      .distinct().collect().map(_.getInt(0)).toSeq
  }

  private def candidates(prepared: DataFrame, queries: DataFrame,
      probes: Int): DataFrame = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    val q = maybeNormalize(queries, "qvector")
    val nprobeEff = math.min(probes, centroids.length)
    val qProbes = q.withColumn("_probe",
      explode(nearestCentroidsUdf(centroids, nprobeEff)(col("qvector"))))
      .select(col("query_id"), col("qvector"), col("_probe"))
    val d = metric match {
      // pre-normalized: cosine == 1 - dot (faiss.py:150-155)
      case Metric.Cosine =>
        VectorFunctions.inner_product_distance(col("vector"), col("qvector"))
      case m => VectorFunctions.distance(m)(col("vector"), col("qvector"))
    }
    prepared.join(broadcast(qProbes),
        prepared("_centroid") === qProbes("_probe"))
      .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"))
  }

  def query(prepared: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    TopK.topKPerGroup(candidates(prepared, queries, nprobe),
      Seq("query_id"), "id", "dist", k)
  }

  /** rows actually scored = Σ over (query, probed cell) of |cell| — the
    * pruning ratio vs brute force is the IVF speed story in one number */
  override def scanVolume(prepared: DataFrame, queries: DataFrame): Long = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    val q = maybeNormalize(queries, "qvector")
    val nprobeEff = math.min(nprobe, centroids.length)
    val qProbes = q.select(
      explode(nearestCentroidsUdf(centroids, nprobeEff)(col("qvector")))
        .as("_probe"))
    val cellSizes = prepared.groupBy("_centroid").count()
    val total = qProbes.join(cellSizes, qProbes("_probe") === cellSizes("_centroid"))
      .agg(sum("count")).head.get(0)
    if (total == null) 0L else total.asInstanceOf[Long]
  }

  /** Recall-vs-cost tuning curve — the number a 100 TB deployment
    * actually tunes: for each nprobe in `probes`, recall@k against the
    * exact top-k and the fraction of the store scanned. ONE scored
    * kernel pass at max(probes) serves every point: the probe explode
    * carries its PROBE RANK (position in the query's nearest-cell
    * list), so the candidate set at a smaller nprobe is a rank filter
    * on the same cached frame — the sweep costs one scan plus
    * per-point bounded selections, not |probes| scans. Deterministic
    * end to end (seeded KMeans, canonical tie-breaks), so the curve is
    * a stable artifact: recall is nondecreasing in nprobe and reaches
    * exactly 1.0 at nprobe = nlist (spec-pinned), where scanned
    * fraction reaches exactly 1. */
  def nprobeCurve(prepared: DataFrame, queries: DataFrame, k: Int,
      probes: Seq[Int]): DataFrame = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    require(probes.nonEmpty && k >= 1)
    val ps = probes.distinct.sorted.map(p => math.min(p, centroids.length))
    val q = maybeNormalize(queries, "qvector")
    val qProbes = q.select(col("query_id"), col("qvector"),
        posexplode(nearestCentroidsUdf(centroids, ps.max)(col("qvector"))))
      .toDF("query_id", "qvector", "_rank", "_probe")
    val d = metric match {
      case Metric.Cosine =>
        VectorFunctions.inner_product_distance(col("vector"), col("qvector"))
      case m => VectorFunctions.distance(m)(col("vector"), col("qvector"))
    }
    val scored = prepared.join(broadcast(qProbes),
        prepared("_centroid") === qProbes("_probe"))
      .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"),
        col("_rank"))
      .cache()
    // ground truth needs the full store in the scored frame: demand the
    // exact point in the sweep rather than silently grading against a
    // pruned "truth"
    require(ps.max == centroids.length,
      s"probes must include nlist=${centroids.length} for exact ground truth")
    val exact = TopK.topKPerGroup(
        scored.select("query_id", "id", "dist"),
        Seq("query_id"), "id", "dist", k)
      .select(col("query_id"), col("id"))
    // ONE sweep job: every (pair, sweep point) with the pair's probe rank
    // under the point's nprobe feeds a single bounded-heap pass grouped by
    // (query, nprobe); hits and scan volumes aggregate per point
    val pArr = array(ps.map(p => lit(p.toLong)): _*)
    val swept = scored.withColumn("nprobe", explode(pArr))
      .where(col("_rank") < col("nprobe"))
    val hits = TopK.topKPerGroup(
        swept.select("query_id", "nprobe", "id", "dist"),
        Seq("query_id", "nprobe"), "id", "dist", k)
      .join(exact, Seq("query_id", "id"), "left_semi")
      .groupBy("nprobe").agg(count(lit(1)).as("_hits"))
    val cellSizes = prepared.groupBy("_centroid").count()
    val scanned = qProbes.withColumn("nprobe", explode(pArr))
      .where(col("_rank") < col("nprobe"))
      .join(cellSizes, qProbes("_probe") === cellSizes("_centroid"))
      .groupBy("nprobe").agg(sum("count").as("_scanned"))
    val nQ = q.agg(count(lit(1)).as("_nq"))
    val nRows = prepared.agg(count(lit(1)).as("_nrows"))
    // scanned has every sweep point (rank 0 < p always); a zero-hit point
    // must still emit its row
    scanned.join(hits, Seq("nprobe"), "left")
      .withColumn("_hits", coalesce(col("_hits"), lit(0L)))
      .crossJoin(nQ).crossJoin(nRows)
      .select(col("nprobe"),
        round(col("_hits").cast("double")
          / (col("_nq") * k).cast("double"), 4).as("recall"),
        round(col("_scanned").cast("double")
          / (col("_nq") * col("_nrows")).cast("double"), 6).as("scan_frac"))
  }

  /** UNCAPPED within the probed cells — FAISS IVF is a range-search index,
    * so its threshold path ignores `max_k` entirely and returns every
    * candidate with `dist < threshold` (`faiss.py:18-23`, `175-183`). */
  def queryThreshold(prepared: DataFrame, queries: DataFrame,
      threshold: Double, maxK: Int): DataFrame =
    candidates(prepared, queries, nprobe)
      .where(col("dist") < IndexStrategy.faissRangeBound(metric, threshold))

  /** Distributed ANN self-join: each row's approximate k nearest OTHER
    * rows with NO broadcast and NO driver collect on either side — the
    * 100 TB compute path for similarity self-joins (the exact blocked
    * kernel in `Knn.selfJoin` is O(n²) compute by definition; this is
    * O(Σ_cell |cell| · |probes into cell|)). The store keys by its single
    * assigned cell, the query side (the same frame) explodes to its
    * nprobe nearest cells, and the cell equi-join shuffles by cell id;
    * a (query, candidate) pair arises at most once because the candidate
    * owns exactly one cell. With nprobe = nlist the candidate set is all
    * pairs and the output EQUALS the exact self-join (spec-asserted).
    */
  def selfJoin(prepared: DataFrame, k: Int, probes: Int = 0): DataFrame = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    require(k >= 1, s"k must be >= 1, got $k")
    // probes <= 0 means the instance's nprobe; probes = nlist is exact
    val nprobeEff = math.min(if (probes > 0) probes else nprobe,
      centroids.length)
    val probeSide = prepared.select(col("id").as("query_id"),
      col("vector").as("qvector"),
      explode(nearestCentroidsUdf(centroids, nprobeEff)(col("vector")))
        .as("_probe"))
    val d = metric match {
      case Metric.Cosine =>
        VectorFunctions.inner_product_distance(col("vector"), col("qvector"))
      case m => VectorFunctions.distance(m)(col("vector"), col("qvector"))
    }
    val pairs = prepared.select(col("id"), col("vector"), col("_centroid"))
      .join(probeSide, col("_centroid") === col("_probe"))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"))
    TopK.topKPerGroup(pairs, Seq("query_id"), "id", "dist", k)
  }
}
