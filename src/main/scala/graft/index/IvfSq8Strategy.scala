package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Metric

/** Composed IVF + scalar quantization ≙ FAISS `ivf_scalar`
  * (`/root/reference/vicinity/backends/faiss.py:105-110`: an
  * `IndexIVFScalarQuantizer` — KMeans cells over SQ-compressed codes): the
  * store is partitioned into IVF cells AND compressed to one byte per
  * dimension, so a query scans only the `nprobe` probed cells and scores
  * their quantized codes with the asymmetric SQ kernel.
  *
  * Same composition pattern as [[IvfPqStrategy]]: [[IvfStrategy]] supplies
  * the `_centroid` partition-pruning column and persisted centroids,
  * [[Sq8Strategy]] supplies the `_codes` column and persisted ranges —
  * save/load round-trips both artifacts, so loading never retrains.
  */
case class IvfSq8Strategy(metric: Metric, nlist: Int = 100, nprobe: Int = 4,
    rerank: Boolean = false, rerankFactor: Int = 4, seed: Long = 42L)
  extends IndexStrategy with DiskServing {
  require(metric == Metric.Cosine || metric == Metric.Euclidean,
    s"Metric '${metric.name}' is not supported by the IVF-scalar backend.")
  val name = "ivf_scalar"

  private val ivf = IvfStrategy(metric, nlist, nprobe, seed)
  private val sq = Sq8Strategy(metric, rerank, rerankFactor)

  def prepare(store: DataFrame): DataFrame =
    sq.prepare(ivf.prepare(store)) // cell assignment + SQ codes

  override def prepareIncrement(prevPrepared: DataFrame, newRows: DataFrame,
      fullStore: DataFrame): DataFrame =
    if (!ivf.isTrained || !sq.isTrained) prepare(fullStore)
    // assign + quantize only the new rows with the trained artifacts
    else prevPrepared.unionByName(sq.prepare(ivf.prepare(newRows)))

  /** restrict the SQ scan to the union of all queries' probe cells —
    * partition pruning on the `_centroid`-partitioned index layout */
  private def pruned(prepared: DataFrame, queries: DataFrame): DataFrame = {
    val probeCells = ivf.probeCells(queries)
    prepared.where(col("_centroid").isin(probeCells: _*))
  }

  def query(prepared: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    sq.query(pruned(prepared, queries), queries, k)
  }

  /** UNCAPPED within the probed cells, like the other FAISS range-search
    * indexes (`faiss.py:18-23`, `175-183`): prune cells, mask the
    * quantized distances, ignore `max_k`. */
  def queryThreshold(prepared: DataFrame, queries: DataFrame,
      threshold: Double, maxK: Int): DataFrame =
    sq.queryThreshold(pruned(prepared, queries), queries, threshold, maxK)

  override def saveAux(dir: String): Unit = {
    ivf.saveAux(dir)
    sq.saveAux(dir)
  }

  override def loadAux(dir: String): Unit = {
    ivf.loadAux(dir)
    sq.loadAux(dir)
  }

  override def writeIndex(prepared: DataFrame, path: String): Unit =
    ivf.writeIndex(prepared, path)

  /** Disk-resident serving for the QUANTIZED index — the layout where the
    * 100 TB I/O arithmetic actually lands: the scan is partition-pruned
    * to the probed cells (like [[IvfStrategy.queryFromDisk]]) AND
    * column-pruned to `(id, _codes)` by the quantized kernel's
    * projection, so a probe reads ~nprobe/nlist of the rows at ~1 byte
    * per dimension instead of 8 (spec asserts the scan's ReadSchema
    * carries no raw `vector` column on the no-rerank paths). The rerank
    * variant reads the raw vectors of the probed cells in a SECOND,
    * survivor-joined pass — the refine step pays full-precision I/O only
    * for candidates. */
  override def writeServingIndex(prepared: DataFrame, path: String): Unit =
    ivf.writeServingCells(prepared, path, name)

  override def queryFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int): DataFrame = {
    require(ivf.isTrained && sq.isTrained,
      "IvfSq8Strategy.prepare must run before query")
    query(ivf.servingRows(spark, path, name), queries, k)
  }

  /** Pre-filter serving off the cell layout (r15 — evening out the
    * capability matrix): the predicate gates the layout rows BEFORE the
    * quantized kernel ([[IndexStrategy.queryFiltered]]'s pre-filter
    * semantics), and BOTH reductions reach the parquet reader — the
    * probe IN-list prunes cell directories and a simple predicate lands
    * in PushedFilters. */
  override def supportsDiskFiltered: Boolean = true
  override def queryFilteredFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int,
      predicate: org.apache.spark.sql.Column): DataFrame = {
    require(ivf.isTrained && sq.isTrained,
      "IvfSq8Strategy.prepare must run before query")
    queryFiltered(ivf.servingRows(spark, path, name).where(predicate),
      queries, k)
  }

  /** [[queryFromDisk]] for the range-search entry point: same pruned
    * quantized scan, same FAISS strict-`<` masked-distance semantics. */
  override def supportsDiskThreshold: Boolean = true
  override def queryThresholdFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, threshold: Double,
      maxK: Int): DataFrame = {
    require(ivf.isTrained && sq.isTrained,
      "IvfSq8Strategy.prepare must run before query")
    queryThreshold(ivf.servingRows(spark, path, name), queries, threshold,
      maxK)
  }

  /** Partition-scoped delete delegates to the inner IVF's cell rewrite
    * (verdict r14 #2 — the layout IS `ivf.writeIndex`'s, so the delete
    * discipline is identical: the touched cell is COMPUTED from each
    * delete row's vector, survivors — SQ codes included, they ride as
    * ordinary columns — swap in per cell directory, untouched cells keep
    * byte-identical files). Deletes arrive as `(id, vector)`. */
  override def supportsDiskDelete: Boolean = true
  override def deleteFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, deletes: DataFrame, tag: String): Long =
    ivf.deleteCells(spark, path, name, deletes, tag)

  /** Append through the shared cell-generation machinery (r16): the
    * increment assigns to the trained cells AND quantizes with the
    * trained ranges — FAISS `add` after `train`, neither artifact
    * retrains — and lands as `_gen=N` of exactly its cells. */
  override def supportsDiskAppend: Boolean = true
  override def appendToServing(spark: org.apache.spark.sql.SparkSession,
      path: String, prevPrepared: DataFrame, newRows: DataFrame,
      tag: String): DataFrame = {
    require(ivf.isTrained && sq.isTrained,
      "IvfSq8Strategy.prepare must run before append")
    val inc = sq.prepare(ivf.prepare(newRows))
    ivf.appendPreparedCells(spark, path, name, inc, tag)
    prevPrepared.unionByName(inc)
  }

  override def supportsCompaction: Boolean = true
  override protected def doCompactServing(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = ivf.compactCells(spark, path, name)

  /** retrain BOTH learned artifacts — the codebook and the SQ ranges —
    * on the layout's live rows ([[IvfStrategy.rebuildCells]]; `_codes`
    * is this family's aux column, re-derived by the fresh prepare) */
  override def supportsRebuild: Boolean = true
  override protected def doRebuildServing(spark: org.apache.spark.sql.SparkSession,
      path: String): DiskServing.Rebuilt =
    ivf.rebuildCells(spark, path, name, Seq("_codes"), this.copy())

  /** the maintenance fence's committed counters ([[DiskServing]]) */
  override def committedCounts(spark: org.apache.spark.sql.SparkSession,
      path: String): Map[String, Int] = ivf.committedCounts(spark, path)

  override def fsckServing(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = ivf.fsckCells(spark, path, name)

  /** rows actually scored = rows in the probed cells (same cells as the
    * inner IVF — quantization changes bytes per row, not rows) */
  override def scanVolume(prepared: DataFrame, queries: DataFrame): Long =
    ivf.scanVolume(prepared, queries)

  /** adopt an identically-trained IVF's centroids (same nlist/seed/store ⇒
    * bitwise-equal to what this instance would train — see
    * [[IvfStrategy.adoptCentroids]]); skips one KMeans per build */
  private[graft] def adoptCentroids(c: Array[Array[Double]]): Unit =
    ivf.adoptCentroids(c)
}
