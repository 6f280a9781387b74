package graft.index

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.{TopK, TopKHeap, VectorFunctions}

/** Per-query ADC state shipped to executors: probed cells, lookup table(s),
  * per-cell offsets (top-level so the broadcast doesn't drag a strategy
  * `$outer` reference along; see [[IvfPqStrategy]] for the decomposition). */
private[index] case class QueryAdc(qid: Long, probes: Array[Int],
  tables: Array[Array[Array[Double]]], offsets: Array[Double])

/** Composed IVF+PQ ≙ FAISS `ivfpq` (`/root/reference/vicinity/backends/
  * faiss.py:107-109`): the store is partitioned into KMeans cells (IVF) AND
  * compressed to product-quantized codes, so a query touches only the
  * `nprobe` nearest cells and scores them with ADC lookup tables — the
  * two scale levers stacked: partition pruning cuts the rows scanned,
  * quantization cuts the bytes per row.
  *
  * Codes are trained on CELL RESIDUALS (`vector − centroid(cell)`), the
  * actual FAISS IVFPQ encoding — residuals concentrate around the origin,
  * so the same codebook budget quantizes them with far less error than raw
  * vectors. ADC scoring decomposes per metric:
  *  - cosine (pre-normalized, `1 − q·x` with `x ≈ c + r̂`):
  *    `q·x = q·c + Σ_s q_s·r̂_s` — ONE dot-product table per query
  *    (cell-independent) plus a per-cell scalar offset `q·c`;
  *  - euclidean (`‖q − c − r̂‖²`): a squared-distance table per
  *    (query, probed cell) built from the query residual `q − c`.
  * Optional exact re-rank of the top candidates ≙ `ivfpqr` refinement
  * (`faiss.py:110-114`).
  */
case class IvfPqStrategy(metric: Metric, nlist: Int = 100, nprobe: Int = 4,
    m: Int = 8, nbits: Int = 8, rerank: Boolean = false,
    rerankFactor: Int = 4, seed: Long = 42L) extends IndexStrategy with DiskServing {
  require(metric == Metric.Cosine || metric == Metric.Euclidean,
    s"Metric '${metric.name}' is not supported by the IVFPQ backend.")
  require(nbits >= 1 && nbits <= 8, s"nbits must be in [1,8], got $nbits")
  val name = "ivfpq"

  private val ivf = IvfStrategy(metric, nlist, nprobe, seed)

  /** see `IvfStrategy.adoptCentroids` — skips the inner IVF's retrain when
    * an identically-configured codebook already exists. Must happen BEFORE
    * prepare: the residual codebooks are trained against cell centroids,
    * so swapping centroids under trained codes would silently corrupt ADC
    * scoring. */
  private[graft] def adoptCentroids(c: Array[Array[Double]]): Unit = {
    require(codebooks == null,
      "adoptCentroids must be called before prepare trains residual codebooks")
    ivf.adoptCentroids(c)
  }

  /** residual codebooks(s)(c); trained once on an id-ordered sample */
  @transient private var codebooks: Array[Array[Array[Double]]] = _
  @transient private var subDims: Array[Int] = _

  private def k: Int = 1 << nbits
  private val maxTrainRows = 20000

  private def residual(v: Array[Double], c: Array[Double]): Array[Double] = {
    val out = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { out(i) = v(i) - c(i); i += 1 }
    out
  }

  /** encode each row's CELL RESIDUAL with the trained codebooks */
  private def encodeResiduals(assigned: DataFrame): DataFrame = {
    val cb = codebooks
    val dims = subDims
    val cents = ivf.centroidArray
    val enc = udf { (v: Seq[Double], cell: Int) =>
      PqCore.encode(cb, dims, residual(v.toArray, cents(cell)))
    }
    assigned.withColumn("_pq", enc(col("vector"), col("_centroid").cast("int")))
  }

  def prepare(store: DataFrame): DataFrame = {
    val assigned = ivf.prepare(store) // normalized vector + _centroid
    if (codebooks == null) {
      val cents = ivf.centroidArray
      // id-ordered sample of residuals: deterministic codebooks
      val sample = assigned.orderBy("id")
        .select(col("vector"), col("_centroid").cast("int"))
        .limit(maxTrainRows)
        .collect()
        .map(r => residual(r.getSeq[Double](0).toArray, cents(r.getInt(1))))
      require(sample.nonEmpty, "cannot train IVFPQ on an empty store")
      val (cb, dims) = PqCore.train(sample, m, k, seed)
      codebooks = cb
      subDims = dims
    }
    encodeResiduals(assigned)
  }

  override def prepareIncrement(prevPrepared: DataFrame, newRows: DataFrame,
      fullStore: DataFrame): DataFrame =
    if (codebooks == null || !ivf.isTrained) prepare(fullStore)
    // assign new rows to existing cells, encode with existing codebooks
    else prevPrepared.unionByName(encodeResiduals(ivf.prepare(newRows)))

  private def adcTopK(prepared: DataFrame, queries: DataFrame,
      kTop: Int): DataFrame = {
    require(codebooks != null, "IvfPqStrategy.prepare must run before query")
    val spark = prepared.sparkSession
    val cents = ivf.centroidArray
    val cb = codebooks
    val dims = subDims
    val isCosine = metric == Metric.Cosine
    val nprobeEff = math.min(nprobe, cents.length)
    val q = maybeNormalize(queries, "qvector")
      .select(col("query_id").cast("long"), col("qvector"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))

    def dotTable(qv: Array[Double]): Array[Array[Double]] = {
      var start = 0
      cb.indices.map { s =>
        val len = dims(s)
        val row = cb(s).map { ct =>
          var acc = 0.0; var j = 0
          while (j < len) { acc += qv(start + j) * ct(j); j += 1 }
          acc
        }
        start += len
        row
      }.toArray
    }
    def sqTable(qres: Array[Double]): Array[Array[Double]] = {
      var start = 0
      cb.indices.map { s =>
        val len = dims(s)
        val row = cb(s).map { ct =>
          var acc = 0.0; var j = 0
          while (j < len) { val x = qres(start + j) - ct(j); acc += x * x; j += 1 }
          acc
        }
        start += len
        row
      }.toArray
    }

    val adcs: Array[QueryAdc] = q.map { case (qid, qv) =>
      // nprobe nearest cells, driver-side (centroids are a local constant)
      val probes = cents.indices
        .map { c =>
          var d = 0.0; var i = 0
          while (i < qv.length) { val x = qv(i) - cents(c)(i); d += x * x; i += 1 }
          (d, c)
        }
        .sortBy(identity).take(nprobeEff).map(_._2).toArray
      if (isCosine) {
        val offs = probes.map { c =>
          var acc = 0.0; var i = 0
          while (i < qv.length) { acc += qv(i) * cents(c)(i); i += 1 }
          acc
        }
        QueryAdc(qid, probes, Array(dotTable(qv)), offs)
      } else {
        QueryAdc(qid, probes,
          probes.map(c => sqTable(residual(qv, cents(c)))),
          new Array[Double](probes.length))
      }
    }
    val allCells = adcs.flatMap(_.probes).distinct.toSeq
    val bc = spark.sparkContext.broadcast(adcs)
    // IVF pruning: scan only the union of probed cells (partition pruning
    // on the `_centroid`-partitioned index layout)
    val partials = prepared
      .where(col("_centroid").isin(allCells: _*))
      .select(col("id").cast("long"), col("_centroid").cast("int"), col("_pq"))
      .rdd.mapPartitions { rows =>
        val qs = bc.value
        val heaps = Array.fill(qs.length)(new TopKHeap(kTop))
        rows.foreach { r =>
          val id = r.getLong(0)
          val cell = r.getInt(1)
          val codes = r.getAs[Array[Byte]](2)
          var qi = 0
          while (qi < qs.length) {
            val qa = qs(qi)
            // linear probe-list scan: nprobe entries, cache-friendly
            var pi = 0
            var found = -1
            while (pi < qa.probes.length && found < 0) {
              if (qa.probes(pi) == cell) found = pi
              pi += 1
            }
            if (found >= 0) {
              val t = if (isCosine) qa.tables(0) else qa.tables(found)
              var acc = 0.0
              var s = 0
              while (s < codes.length) { acc += t(s)(codes(s) & 0xff); s += 1 }
              val dist =
                if (isCosine) 1.0 - (qa.offsets(found) + acc) // 1 − (q·c + q·r̂)
                else math.sqrt(math.max(acc, 0.0))
              heaps(qi).add(id, math.max(dist, 0.0))
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.sorted.map(nb => Row(qs(qi).qid, nb.id, nb.dist))
        }
      }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("dist",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    TopK.topKPerGroup(spark.createDataFrame(partials, schema),
      Seq("query_id"), "id", "dist", kTop)
  }

  def query(prepared: DataFrame, queries: DataFrame, kTop: Int): DataFrame = {
    require(kTop >= 1, s"k must be >= 1, got $kTop")
    if (!rerank) adcTopK(prepared, queries, kTop)
    else {
      val q = maybeNormalize(queries, "qvector")
      val cands = adcTopK(prepared, queries, kTop * rerankFactor)
        .select("query_id", "id")
      val d = VectorFunctions.distance(metric)(col("vector"), col("qvector"))
      val exact = cands
        .join(prepared.select(col("id"), col("vector")), Seq("id"))
        .join(broadcast(q.select(col("query_id"), col("qvector"))), Seq("query_id"))
        .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"))
      TopK.topKPerGroup(exact, Seq("query_id"), "id", "dist", kTop)
    }
  }

  def queryThreshold(prepared: DataFrame, queries: DataFrame,
      threshold: Double, maxK: Int): DataFrame = {
    if (maxK <= 0) return IndexStrategy.emptyThreshold(queries)
    val capped = query(prepared, queries, maxK)
    capped.where(col("dist") < threshold).drop("rank")
  }

  override def saveAux(dir: String): Unit = {
    ivf.saveAux(dir)
    require(codebooks != null, "nothing to save before prepare")
    graft.core.FsIO.write(s"$dir/pq_codebooks.json",
      PqCore.toJson(codebooks, subDims))
  }

  override def loadAux(dir: String): Unit = {
    ivf.loadAux(dir)
    if (graft.core.FsIO.exists(s"$dir/pq_codebooks.json")) {
      val (cb, dims) = PqCore.fromJson(
        graft.core.FsIO.read(s"$dir/pq_codebooks.json"))
      codebooks = cb
      subDims = dims
    }
  }

  override def writeIndex(prepared: DataFrame, path: String): Unit =
    ivf.writeIndex(prepared, path)

  /** Disk-resident serving for the PQ-coded layout — the third
    * deployment family served straight from the cell-partitioned
    * parquet index (flat IVF: `IvfStrategy.queryFromDisk`, scalar:
    * `IvfSq8Strategy.queryFromDisk`): the ADC scan's probe filter
    * becomes a partition filter and its projection is
    * `(id, _centroid, _pq)` — m code bytes per row off storage, the
    * most compressed serving shape of the three. The rerank variant
    * reads raw vectors only through the candidate refine join. Results
    * identical to [[query]] on the in-memory prepared frame
    * (spec-pinned at pruned nprobe; oracle-checked exact through the
    * rerank path at nprobe = nlist). */
  override def writeServingIndex(prepared: DataFrame, path: String): Unit =
    ivf.writeServingCells(prepared, path, name)

  override def queryFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, kTop: Int): DataFrame = {
    require(codebooks != null, "IvfPqStrategy.prepare must run before query")
    query(ivf.servingRows(spark, path, name), queries, kTop)
  }

  /** [[queryThreshold]] off the layout (r15 — evening out the
    * capability matrix): the ANN threshold contract (top-max_k ADC
    * scan, then the strict `<` mask) over the same probe-pruned,
    * code-projected disk scan as [[queryFromDisk]]. */
  override def supportsDiskThreshold: Boolean = true
  override def queryThresholdFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, threshold: Double,
      maxK: Int): DataFrame = {
    require(codebooks != null, "IvfPqStrategy.prepare must run before query")
    queryThreshold(ivf.servingRows(spark, path, name), queries, threshold,
      maxK)
  }

  /** Pre-filter serving off the cell layout (r15): predicate before the
    * ADC kernel, pushed into the scan alongside the probe prune. */
  override def supportsDiskFiltered: Boolean = true
  override def queryFilteredFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int,
      predicate: org.apache.spark.sql.Column): DataFrame = {
    require(codebooks != null, "IvfPqStrategy.prepare must run before query")
    queryFiltered(ivf.servingRows(spark, path, name).where(predicate),
      queries, k)
  }

  /** Partition-scoped delete delegates to the inner IVF's cell rewrite
    * (verdict r14 #2 — the layout IS `ivf.writeIndex`'s cell-partitioned
    * shape; PQ codes ride as ordinary columns through the survivor
    * rewrite). Deletes arrive as `(id, vector)` — the touched cell is
    * computed from the vector, never searched. */
  override def supportsDiskDelete: Boolean = true
  override def deleteFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, deletes: DataFrame, tag: String): Long =
    ivf.deleteCells(spark, path, name, deletes, tag)

  /** Append through the shared cell-generation machinery (r16): the
    * increment assigns to the trained cells and its RESIDUALS encode
    * with the trained codebooks — FAISS `add` after `train`, nothing
    * retrains — landing as `_gen=N` of exactly its cells. */
  override def supportsDiskAppend: Boolean = true
  override def appendToServing(spark: org.apache.spark.sql.SparkSession,
      path: String, prevPrepared: DataFrame, newRows: DataFrame,
      tag: String): DataFrame = {
    require(codebooks != null && ivf.isTrained,
      "IvfPqStrategy.prepare must run before append")
    val inc = encodeResiduals(ivf.prepare(newRows))
    ivf.appendPreparedCells(spark, path, name, inc, tag)
    prevPrepared.unionByName(inc)
  }

  override def supportsCompaction: Boolean = true
  override protected def doCompactServing(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = ivf.compactCells(spark, path, name)

  /** retrain the coarse codebook AND the residual PQ codebooks on the
    * layout's live rows ([[IvfStrategy.rebuildCells]]; `_pq` is this
    * family's aux column, re-encoded by the fresh prepare) */
  override def supportsRebuild: Boolean = true
  override protected def doRebuildServing(spark: org.apache.spark.sql.SparkSession,
      path: String): DiskServing.Rebuilt =
    ivf.rebuildCells(spark, path, name, Seq("_pq"), this.copy())

  /** the maintenance fence's committed counters ([[DiskServing]]) */
  override def committedCounts(spark: org.apache.spark.sql.SparkSession,
      path: String): Map[String, Int] = ivf.committedCounts(spark, path)

  override def fsckServing(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = ivf.fsckCells(spark, path, name)

  /** ADC scans exactly the probed IVF cells */
  override def scanVolume(prepared: DataFrame, queries: DataFrame): Long =
    ivf.scanVolume(prepared, queries)
}
