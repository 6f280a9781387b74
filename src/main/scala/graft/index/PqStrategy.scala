package graft.index

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.{TopK, TopKHeap, VectorFunctions}

/** Product quantization ≙ the reference's FAISS `pq` index family
  * (`/root/reference/vicinity/backends/faiss.py:95-100`, params `m`, `nbits`
  * at `faiss.py:35-43`): the vector is split into `m` subspaces, each
  * compressed to one byte by a per-subspace KMeans codebook of `2^nbits`
  * centroids, and queries score codes with asymmetric distance — per query,
  * a (m × 2^nbits) lookup table of subspace distances is precomputed and a
  * code row's distance is m table lookups. Optional exact re-rank of the
  * top candidates ≙ `ivfpqr` refinement (`faiss.py:110-114`).
  *
  * Scale shape: codes are m bytes/row (dim·4/m× compression); codebooks are
  * a driver-side constant trained on a bounded, id-ordered (deterministic)
  * sample — train cost never scales with the store; the ADC scan runs
  * partition-local with bounded heaps, so only q×k×partitions rows shuffle.
  * Codebooks persist via [[saveAux]]/[[loadAux]], so load never retrains
  * (≙ `faiss.py:199-204`: the index file is read back, not rebuilt).
  */
case class PqStrategy(metric: Metric, m: Int = 8, nbits: Int = 8,
    rerank: Boolean = false, rerankFactor: Int = 4, seed: Long = 42L)
  extends IndexStrategy {
  require(metric == Metric.Cosine || metric == Metric.Euclidean,
    s"Metric '${metric.name}' is not supported by the PQ backend.")
  require(nbits >= 1 && nbits <= 8, s"nbits must be in [1,8], got $nbits")
  val name = "pq"

  /** codebooks(s)(c) = centroid c of subspace s; trained once */
  @transient private var codebooks: Array[Array[Array[Double]]] = _
  @transient private var subDims: Array[Int] = _

  private def k: Int = 1 << nbits
  private val maxTrainRows = 20000

  def prepare(store: DataFrame): DataFrame = {
    val normed = maybeNormalize(store, "vector")
    if (codebooks == null) {
      // id-ordered sample: same codebooks for any partitioning/row order
      val sample = normed.orderBy("id").select("vector").limit(maxTrainRows)
        .collect().map(_.getSeq[Double](0).toArray)
      require(sample.nonEmpty, "cannot train PQ on an empty store")
      val (cb, dims) = PqCore.train(sample, m, k, seed)
      codebooks = cb
      subDims = dims
    }
    val cb = codebooks
    val dims = subDims
    val encode = udf { (v: Seq[Double]) => PqCore.encode(cb, dims, v.toArray) }
    normed.withColumn("_pq", encode(col("vector")))
  }

  override def prepareIncrement(prevPrepared: DataFrame, newRows: DataFrame,
      fullStore: DataFrame): DataFrame =
    if (codebooks == null) prepare(fullStore)
    else prevPrepared.unionByName(prepare(newRows)) // codebooks reused

  override def saveAux(dir: String): Unit = {
    require(codebooks != null, "nothing to save before prepare")
    graft.core.FsIO.write(s"$dir/pq_codebooks.json",
      PqCore.toJson(codebooks, subDims))
  }

  override def loadAux(dir: String): Unit = {
    if (graft.core.FsIO.exists(s"$dir/pq_codebooks.json")) {
      val (cb, dims) = PqCore.fromJson(
        graft.core.FsIO.read(s"$dir/pq_codebooks.json"))
      codebooks = cb
      subDims = dims
    }
  }

  /** ADC scan: per partition, per query, distance = Σ_s table[s][code_s] */
  private def adcTopK(prepared: DataFrame, queries: DataFrame,
      kTop: Int): DataFrame = {
    require(codebooks != null, "PqStrategy.prepare must run before query")
    val spark = prepared.sparkSession
    val q = maybeNormalize(queries, "qvector")
      .select(col("query_id").cast("long"), col("qvector"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val cb = codebooks
    val dims = subDims
    val isCosine = metric == Metric.Cosine
    // per query: subspace lookup tables (squared L2 or dot per centroid)
    val tables: Array[(Long, Array[Array[Double]])] = q.map { case (qid, qv) =>
      var start = 0
      val t = cb.indices.map { s =>
        val len = dims(s)
        val row = cb(s).map { ct =>
          var acc = 0.0
          var j = 0
          while (j < len) {
            if (isCosine) acc += qv(start + j) * ct(j)
            else { val x = qv(start + j) - ct(j); acc += x * x }
            j += 1
          }
          acc
        }
        start += len
        row
      }.toArray
      (qid, t)
    }
    val bc = spark.sparkContext.broadcast(tables)
    val partials = prepared.select(col("id").cast("long"), col("_pq")).rdd
      .mapPartitions { rows =>
        val tabs = bc.value
        val heaps = Array.fill(tabs.length)(new TopKHeap(kTop))
        rows.foreach { r =>
          val id = r.getLong(0)
          val codes = r.getAs[Array[Byte]](1)
          var qi = 0
          while (qi < tabs.length) {
            val t = tabs(qi)._2
            var acc = 0.0
            var s = 0
            while (s < codes.length) { acc += t(s)(codes(s) & 0xff); s += 1 }
            val dist =
              if (isCosine) 1.0 - acc
              else math.sqrt(math.max(acc, 0.0))
            heaps(qi).add(id, math.max(dist, 0.0))
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          h.sorted.map(nb => Row(tabs(qi)._1, nb.id, nb.dist))
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
    val capped = query(prepared, queries, math.max(maxK, 1))
    capped.where(col("dist") < threshold).drop("rank")
  }
}
