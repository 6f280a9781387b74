package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Metric

/** PCA-rotated product quantization — the transform member of the
  * composition matrix (FAISS's `PCAR{d},PQ{m}` transform chain; the
  * parametric solution of OPQ, Ge, He, Ke & Sun, "Optimized Product
  * Quantization", CVPR 2013 §4: for Gaussian data the optimal rotation is
  * the eigenbasis with eigenvalues BALANCED across subspaces).
  *
  * Plain PQ quantizes raw coordinate blocks; when the store is anisotropic
  * with correlated coordinates, a few subspaces carry most of the variance
  * and the per-subspace k-means budget is wasted. The fix is a pure
  * rotation before coding:
  *
  *  1. covariance → full eigenbasis (driver-side cyclic Jacobi on the d×d
  *     frame — [[graft.prep.Pca.jacobiEigen]]; the distributed work is the
  *     ONE covariance pass the PCA spectrum already does);
  *  2. eigenvalue allocation: principal dims are dealt to subspaces
  *     greedily, each to the subspace with the smallest current
  *     log-eigenvalue product (Ge et al. §4.2) — this balancing is what
  *     plain PCA ordering gets exactly wrong for PQ (it would concentrate
  *     the variance in subspace 0);
  *  3. rows rotate row-locally (O(d²) per row) and everything downstream —
  *     training, encoding, ADC scan, rerank, persistence — delegates to
  *     the inner [[PqStrategy]] unchanged.
  *
  * A rotation about the origin preserves inner products and norms exactly,
  * so rotated-space distances ARE original-space distances (for cosine the
  * rotation commutes with normalization), which is why the rerank path
  * stays an exact-mode oracle anchor. Scale shape: identical to PQ — the
  * rotation adds one broadcast d×d matrix and a row-local matvec.
  *
  * The reference's FAISS backend stops at the un-rotated families
  * (`/root/reference/vicinity/backends/faiss.py:18-23`); this is the
  * beyond-reference member that completes transform × quantizer.
  */
case class OpqStrategy(metric: Metric, m: Int = 8, nbits: Int = 8,
    rerank: Boolean = false, rerankFactor: Int = 4, seed: Long = 42L)
  extends IndexStrategy {
  require(metric == Metric.Cosine || metric == Metric.Euclidean,
    s"Metric '${metric.name}' is not supported by the OPQ backend.")
  val name = "opq"

  private val inner = PqStrategy(metric, m, nbits, rerank, rerankFactor, seed)

  /** rotation rows: output dim i = dot(rot(i), input) */
  @transient private var rot: Array[Array[Double]] = _

  /** Ge et al. §4.2 eigenvalue allocation: dims in eigenvalue-descending
    * order each go to the not-yet-full subspace with the smallest current
    * log-eigenvalue product (ties → lowest subspace index). Returns the
    * eigen index for each output position, subspace blocks contiguous.
    *
    * The log-products are computed on eigenvalues NORMALIZED to
    * λ_min = 1, which makes the greedy scale-invariant: with raw λ < 1
    * (any store whose covariance is small — e.g. unit vectors) every
    * assignment DECREASES a bucket's log-product below the empty bucket's
    * 0, the "least full" bucket is whichever has absorbed the most, and
    * the deal degenerates to the identity permutation — i.e. no rotation
    * benefit at all (measured while building OpqSpec: OPQ ≈ PQ on planted
    * anisotropic data until this floor was added). */
  private[graft] def allocate(evals: Array[Double], subLens: Array[Int]): Array[Int] = {
    val floor = 1e-12
    val logMin = math.log(evals.map(e => math.max(e, floor)).min)
    val buckets = Array.fill(subLens.length)(List.empty[Int])
    val logProd = Array.fill(subLens.length)(0.0)
    for (e <- evals.indices) {
      var best = -1
      for (s <- subLens.indices
           if buckets(s).length < subLens(s) &&
             (best < 0 || logProd(s) < logProd(best)))
        best = s
      buckets(best) = buckets(best) :+ e
      logProd(best) += math.log(math.max(evals(e), floor)) - logMin
    }
    buckets.flatten.toArray
  }

  private def rotate(df: DataFrame, c: String): DataFrame = {
    val r = rot
    val rotUdf = udf { (v: Seq[Double]) =>
      val x = v.toArray
      val out = new Array[Double](r.length)
      var i = 0
      while (i < r.length) {
        val row = r(i)
        var s = 0.0; var j = 0
        while (j < row.length) { s += row(j) * x(j); j += 1 }
        out(i) = s; i += 1
      }
      out.toSeq
    }
    df.withColumn(c, rotUdf(col(c).cast("array<double>")))
  }

  def prepare(store: DataFrame): DataFrame = {
    if (rot == null) {
      graft.core.BuildCounters.trainings.incrementAndGet()
      // rotation chosen from the covariance of what gets quantized: the
      // normalized store for cosine, the raw store for euclidean
      val basis = maybeNormalize(store, "vector")
      val (_, _, cov) = graft.prep.Pca.covariance(basis, "vector")
      val (evals, evecs) = graft.prep.Pca.jacobiEigen(cov)
      // subRanges yields (start, len); allocation needs the lens
      val order = allocate(evals, PqCore.subRanges(cov.length, m).map(_._2))
      rot = order.map(evecs)
    }
    inner.prepare(rotate(store, "vector"))
  }

  override def prepareIncrement(prevPrepared: DataFrame, newRows: DataFrame,
      fullStore: DataFrame): DataFrame =
    if (rot == null) prepare(fullStore)
    else prevPrepared.unionByName(inner.prepare(rotate(newRows, "vector")))

  def query(prepared: DataFrame, queries: DataFrame, kTop: Int): DataFrame = {
    require(rot != null, "OpqStrategy.prepare must run before query")
    inner.query(prepared, rotate(queries, "qvector"), kTop)
  }

  def queryThreshold(prepared: DataFrame, queries: DataFrame,
      threshold: Double, maxK: Int): DataFrame = {
    require(rot != null, "OpqStrategy.prepare must run before query")
    inner.queryThreshold(prepared, rotate(queries, "qvector"), threshold, maxK)
  }

  override def saveAux(dir: String): Unit = {
    require(rot != null, "nothing to save before prepare")
    val json = rot.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    graft.core.FsIO.write(s"$dir/opq_rotation.json", json)
    inner.saveAux(dir)
  }

  override def loadAux(dir: String): Unit = {
    if (graft.core.FsIO.exists(s"$dir/opq_rotation.json")) {
      val s = graft.core.FsIO.read(s"$dir/opq_rotation.json").trim
      rot = s.stripPrefix("[").stripSuffix("]").split("\\],\\[")
        .map(_.stripPrefix("[").stripSuffix("]").split(",").map(_.toDouble))
      inner.loadAux(dir)
    }
  }
}
