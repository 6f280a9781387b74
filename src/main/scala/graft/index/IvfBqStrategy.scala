package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Metric

/** Composed IVF + binary quantization — the engine's extension of FAISS's
  * composed-index pattern (≙ `IndexIVFScalarQuantizer`,
  * `/root/reference/vicinity/backends/faiss.py:105-110`, taken to the
  * 1-bit quantizer): KMeans cells over sign-bit signatures. A query scans
  * only the `nprobe` probed cells, ranks their signatures by packed
  * Hamming, and exact-reranks the tie-inclusive candidate pool.
  *
  * Completes the composition matrix — IVF cells now compose with every
  * quantizer width the engine has (flat: [[IvfStrategy]], 8-bit:
  * [[IvfSq8Strategy]], PQ codebooks: [[IvfPqStrategy]], 1-bit: this).
  * Distinctive property inherited from [[BqStrategy]]: the quantizer is
  * train-free, so the composed index persists ONLY the IVF centroids —
  * save/load has one artifact, and inserts re-use the trained cells while
  * the signatures quantize statelessly.
  *
  * Scale story: probed-cell partition pruning × 8-bytes-per-row signature
  * scan — the coarse pass reads ~nprobe/nlist of the rows at 1/32 of the
  * flat bytes; full-precision I/O is paid only for the rerank candidates.
  */
case class IvfBqStrategy(metric: Metric, nlist: Int = 100, nprobe: Int = 4,
    rerankFactor: Int = 4, seed: Long = 42L)
  extends IndexStrategy with DiskServing {
  require(metric == Metric.Cosine || metric == Metric.Euclidean,
    s"Metric '${metric.name}' is not supported by the IVF-binary backend.")
  val name = "ivf_binary"

  private val ivf = IvfStrategy(metric, nlist, nprobe, seed)
  private val bq = BqStrategy(metric, rerank = true, rerankFactor)

  def prepare(store: DataFrame): DataFrame =
    bq.prepare(ivf.prepare(store)) // cell assignment + sign signatures

  override def prepareIncrement(prevPrepared: DataFrame, newRows: DataFrame,
      fullStore: DataFrame): DataFrame =
    if (!ivf.isTrained) prepare(fullStore)
    // assign with the trained centroids; signatures are train-free
    else prevPrepared.unionByName(bq.prepare(ivf.prepare(newRows)))

  /** probed-cell partition pruning, identical to the other compositions */
  private def pruned(prepared: DataFrame, queries: DataFrame): DataFrame = {
    val probeCells = ivf.probeCells(queries)
    prepared.where(col("_centroid").isin(probeCells: _*))
  }

  def query(prepared: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    bq.query(pruned(prepared, queries), queries, k)
  }

  /** ANN threshold through the composed path: prune cells, Hamming-coarse
    * candidates, exact re-rank, strict `<` + max_k (the BQ family's
    * threshold shape — Hamming is not in the metric's units, so the mask
    * applies after refinement). */
  def queryThreshold(prepared: DataFrame, queries: DataFrame,
      threshold: Double, maxK: Int): DataFrame =
    bq.queryThreshold(pruned(prepared, queries), queries, threshold, maxK)

  /** ONLY the centroids persist — the 1-bit quantizer has no learned
    * state (compare [[IvfSq8Strategy.saveAux]], which must also round-trip
    * the SQ ranges). */
  override def saveAux(dir: String): Unit = ivf.saveAux(dir)
  override def loadAux(dir: String): Unit = ivf.loadAux(dir)

  override def writeIndex(prepared: DataFrame, path: String): Unit =
    ivf.writeIndex(prepared, path)

  /** Disk serving off the cell-partitioned layout: the probe set prunes
    * partitions, the coarse pass projects `(id, _sig)` — 8 bytes of
    * payload per row — and the rerank joins raw vectors for candidates
    * only. */
  override def writeServingIndex(prepared: DataFrame, path: String): Unit =
    ivf.writeServingCells(prepared, path, name)

  override def queryFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int): DataFrame = {
    require(ivf.isTrained, "IvfBqStrategy.prepare must run before query")
    query(ivf.servingRows(spark, path, name), queries, k)
  }

  /** [[queryThreshold]] off the same cell layout — probe cells prune
    * directories, then the BQ family's metric-units ANN radius (Hamming
    * coarse candidates, exact re-rank, strict `<` + max_k). */
  override def supportsDiskThreshold: Boolean = true
  override def queryThresholdFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, threshold: Double,
      maxK: Int): DataFrame = {
    require(ivf.isTrained, "IvfBqStrategy.prepare must run before query")
    queryThreshold(ivf.servingRows(spark, path, name), queries, threshold,
      maxK)
  }

  /** Pre-filter serving, the composed-family member of the filtered set
    * ([[IvfStrategy.queryFilteredFromDisk]]): the predicate lands before
    * the kernel (metadata columns ride in the cell layout, so simple
    * comparisons push into the scan) and composes with probe pruning —
    * identical to the in-memory `queryFiltered` (= [[query]] of the
    * filtered frame). */
  override def supportsDiskFiltered: Boolean = true
  override def queryFilteredFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int,
      predicate: org.apache.spark.sql.Column): DataFrame = {
    require(ivf.isTrained, "IvfBqStrategy.prepare must run before query")
    query(ivf.servingRows(spark, path, name).where(predicate), queries, k)
  }

  /** Partition-scoped delete, delegated to the flat family's rewrite
    * ([[IvfStrategy.deleteFromDisk]] — the layout IS the IVF cell layout,
    * and the rewrite preserves every column, `_sig` included): the
    * touched cells are COMPUTED from the deleted vectors, so a delete
    * batch reads and rewrites only those cell directories. */
  override def supportsDiskDelete: Boolean = true
  override def deleteFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, rows: DataFrame, tag: String): Long =
    ivf.deleteCells(spark, path, name, rows, tag)

  /** Append through the shared cell-generation machinery (r16): cells
    * assign with the trained centroids, signatures quantize train-free
    * (the family's distinctive property) — FAISS `add` after `train`. */
  override def supportsDiskAppend: Boolean = true
  override def appendToServing(spark: org.apache.spark.sql.SparkSession,
      path: String, prevPrepared: DataFrame, newRows: DataFrame,
      tag: String): DataFrame = {
    require(ivf.isTrained, "IvfBqStrategy.prepare must run before append")
    val inc = bq.prepare(ivf.prepare(newRows))
    ivf.appendPreparedCells(spark, path, name, inc, tag)
    prevPrepared.unionByName(inc)
  }

  override def supportsCompaction: Boolean = true
  override protected def doCompactServing(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = ivf.compactCells(spark, path, name)

  /** retrain the coarse codebook on the layout's live rows; the sign
    * signatures (`_sig`) are data-independent and re-derived by the
    * fresh prepare ([[IvfStrategy.rebuildCells]]) */
  override def supportsRebuild: Boolean = true
  override protected def doRebuildServing(spark: org.apache.spark.sql.SparkSession,
      path: String): DiskServing.Rebuilt =
    ivf.rebuildCells(spark, path, name, Seq("_sig"), this.copy())

  /** the maintenance fence's committed counters ([[DiskServing]]) */
  override def committedCounts(spark: org.apache.spark.sql.SparkSession,
      path: String): Map[String, Int] = ivf.committedCounts(spark, path)

  override def fsckServing(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = ivf.fsckCells(spark, path, name)

  /** rows scored = rows in the probed cells, as for the other quantized
    * compositions (bytes per row change, rows do not) */
  override def scanVolume(prepared: DataFrame, queries: DataFrame): Long =
    ivf.scanVolume(prepared, queries)

  private[graft] def adoptCentroids(c: Array[Array[Double]]): Unit =
    ivf.adoptCentroids(c)
}
