package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.TopK

/** Composed IVF+PQ ≙ FAISS `ivfpq` (`/root/reference/vicinity/backends/
  * faiss.py:107-109`): the store is partitioned into KMeans cells (IVF) AND
  * compressed to product-quantized codes, so a query touches only the
  * `nprobe` nearest cells and scores them with ADC lookup tables — the
  * two scale levers stacked: partition pruning cuts the rows scanned,
  * quantization cuts the bytes per row.
  *
  * Codes are trained on raw (normalized) vectors rather than cell residuals
  * — a documented simplification; recall is recovered the FAISS way via the
  * optional exact re-rank (`rerank = true` ≙ `ivfpqr`).
  */
case class IvfPqStrategy(metric: Metric, nlist: Int = 100, nprobe: Int = 4,
    m: Int = 8, nbits: Int = 8, rerank: Boolean = false,
    rerankFactor: Int = 4, seed: Long = 42L) extends IndexStrategy {
  require(metric == Metric.Cosine || metric == Metric.Euclidean,
    s"Metric '${metric.name}' is not supported by the IVFPQ backend.")
  val name = "ivfpq"

  private val ivf = IvfStrategy(metric, nlist, nprobe, seed)
  private val pq = PqStrategy(metric, m, nbits, rerank, rerankFactor, seed)

  def prepare(store: DataFrame): DataFrame =
    pq.prepare(ivf.prepare(store)) // cell assignment + PQ codes

  override def prepareIncrement(prevPrepared: DataFrame, newRows: DataFrame,
      fullStore: DataFrame): DataFrame = {
    val assigned = ivf.prepareIncrement(
      prevPrepared.drop("_pq"), newRows, fullStore)
    // only the new rows need encoding; reuse the trained codebooks
    pq.prepareIncrement(prevPrepared,
      assigned.join(newRows.select(col("id")), "id"), assigned)
  }

  /** restrict the ADC scan to the union of all queries' probe cells —
    * the IVF pruning — then delegate to the PQ scan + (optional) re-rank */
  private def pruned(prepared: DataFrame, queries: DataFrame): DataFrame = {
    val probeCells = ivf.probeCells(queries)
    prepared.where(col("_centroid").isin(probeCells: _*))
  }

  def query(prepared: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    pq.query(pruned(prepared, queries), queries, k)
  }

  def queryThreshold(prepared: DataFrame, queries: DataFrame,
      threshold: Double, maxK: Int): DataFrame = {
    val capped = query(prepared, queries, math.max(maxK, 1))
    capped.where(col("dist") < threshold).drop("rank")
  }

  override def saveAux(dir: String): Unit = ivf.saveAux(dir)
  override def loadAux(dir: String): Unit = ivf.loadAux(dir)
  override def writeIndex(prepared: DataFrame, path: String): Unit =
    ivf.writeIndex(prepared, path)
}
