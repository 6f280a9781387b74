package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.{TopK, VectorFunctions}

/** Scalar-quantization strategy ≙ the reference's FAISS `scalar` / `pq`
  * index family (`/root/reference/vicinity/backends/faiss.py:93-100`,
  * `105-110`): vectors are compressed to one byte per dimension with
  * per-dimension [min, max] ranges learned at build, queries score against
  * the codes with an asymmetric kernel (raw query × dequantized store), and
  * an optional exact re-rank of the top candidates recovers full precision
  * (≙ FAISS `ivfpqr` refinement, `faiss.py:110-114`).
  *
  * Scale story: the quantized index is dim bytes/row instead of 4·dim —
  * a 4× smaller scan; ranges are a driver-side constant (2·dim doubles).
  */
case class Sq8Strategy(metric: Metric, rerank: Boolean = true,
    rerankFactor: Int = 4) extends IndexStrategy with DiskServing {
  require(metric == Metric.Cosine || metric == Metric.Euclidean,
    s"Metric '${metric.name}' is not supported by the SQ8 backend.")
  val name = "sq8"

  /** per-dimension (min, max), learned at build */
  @transient private var lo: Array[Double] = _
  @transient private var hi: Array[Double] = _

  private[index] def isTrained: Boolean = lo != null

  /** ranges persist so load never re-learns them (≙ faiss.py:199-204: the
    * trained SQ index file is read back, not rebuilt) */
  override def saveAux(dir: String): Unit = {
    require(lo != null, "nothing to save before prepare")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    val loArr = root.putArray("lo"); lo.foreach(loArr.add)
    val hiArr = root.putArray("hi"); hi.foreach(hiArr.add)
    graft.core.FsIO.write(s"$dir/sq_ranges.json", mapper.writeValueAsString(root))
  }

  override def loadAux(dir: String): Unit = {
    if (graft.core.FsIO.exists(s"$dir/sq_ranges.json")) {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(graft.core.FsIO.read(s"$dir/sq_ranges.json"))
      val loArr = root.get("lo"); val hiArr = root.get("hi")
      lo = (0 until loArr.size()).map(loArr.get(_).asDouble()).toArray
      hi = (0 until hiArr.size()).map(hiArr.get(_).asDouble()).toArray
    }
  }

  def prepare(store: DataFrame): DataFrame = {
    val normed = maybeNormalize(store, "vector")
    // train-once semantics (≙ FAISS SQ train + add): ranges are learned on
    // the first prepare and REUSED afterwards — re-learning on insert would
    // silently invalidate codes quantized by earlier snapshots that share
    // this strategy instance
    if (lo == null) learnRanges(normed)
    quantized(normed)
  }

  /** new rows are quantized with the existing trained ranges */
  override def prepareIncrement(prevPrepared: DataFrame, newRows: DataFrame,
      fullStore: DataFrame): DataFrame =
    if (lo == null) prepare(fullStore)
    else prevPrepared.unionByName(quantized(maybeNormalize(newRows, "vector")))

  private def learnRanges(normed: DataFrame): Unit = {
    // learn per-dimension ranges in one distributed pass
    val (mins, maxs) = normed.select("vector").rdd
      .map(_.getSeq[Double](0).toArray)
      .treeAggregate((null: Array[Double], null: Array[Double]))(
        seqOp = { case ((mn, mx), v) =>
          if (mn == null) (v.clone(), v.clone())
          else {
            var i = 0
            while (i < v.length) {
              if (v(i) < mn(i)) mn(i) = v(i)
              if (v(i) > mx(i)) mx(i) = v(i)
              i += 1
            }
            (mn, mx)
          }
        },
        combOp = {
          case ((null, _), r) => r
          case (l, (null, _)) => l
          case ((mn1, mx1), (mn2, mx2)) =>
            var i = 0
            while (i < mn1.length) {
              if (mn2(i) < mn1(i)) mn1(i) = mn2(i)
              if (mx2(i) > mx1(i)) mx1(i) = mx2(i)
              i += 1
            }
            (mn1, mx1)
        })
    lo = mins; hi = maxs
    graft.core.BuildCounters.trainings.incrementAndGet()
  }

  private def quantized(normed: DataFrame): DataFrame = {
    val l = lo; val h = hi
    val quantize = udf { (v: Seq[Double]) =>
      val out = new Array[Byte](v.length)
      var i = 0
      while (i < v.length) {
        val range = h(i) - l(i)
        val c = if (range == 0) 0.0 else (v(i) - l(i)) / range * 255.0
        out(i) = math.max(0, math.min(255, math.round(c).toInt)).toByte
        i += 1
      }
      out
    }
    normed.withColumn("_codes", quantize(col("vector")))
  }

  /** asymmetric distance: raw query vs dequantized code
    * (value ≈ lo + (code+0.5)/256·range, the SQ midpoint rule) */
  private def adcUdf = adcUdfWith(lo, hi)

  /** the asymmetric kernel parameterized by ranges — the disk-serving
    * readers adopt the LAYOUT's ranges (the codes were quantized with
    * them), the in-memory path passes the instance's */
  private def adcUdfWith(l: Array[Double], h: Array[Double]) = {
    val isCosine = metric == Metric.Cosine
    udf { (codes: Array[Byte], q: Seq[Double]) =>
      var acc = 0.0; var nx = 0.0; var nq = 0.0
      var i = 0
      while (i < codes.length) {
        val range = h(i) - l(i)
        val x = l(i) + ((codes(i) & 0xff) + 0.5) / 256.0 * range
        val y = q(i)
        if (isCosine) { acc += x * y; nx += x * x; nq += y * y }
        else { val d = x - y; acc += d * d }
        i += 1
      }
      if (isCosine) {
        val denom = math.sqrt(nx) * math.sqrt(nq)
        if (denom == 0) 1.0 else 1.0 - acc / denom
      } else math.sqrt(math.max(acc, 0.0))
    }
  }

  private def approxTopK(prepared: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    require(lo != null, "Sq8Strategy.prepare must run before query")
    val q = maybeNormalize(queries, "qvector")
    val pairs = prepared.select(col("id"), col("_codes"))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("id"),
        greatest(adcUdf(col("_codes"), col("qvector")), lit(0.0)).as("dist"))
    TopK.topKPerGroup(pairs, Seq("query_id"), "id", "dist", k)
  }

  def query(prepared: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    if (!rerank) approxTopK(prepared, queries, k)
    else {
      // refine: exact distance over the top rerankFactor·k codes survivors
      val q = maybeNormalize(queries, "qvector")
      val cands = approxTopK(prepared, queries, k * rerankFactor)
        .select("query_id", "id")
      val d = VectorFunctions.distance(metric)(col("vector"), col("qvector"))
      val exact = cands
        .join(prepared.select(col("id"), col("vector")), Seq("id"))
        .join(broadcast(q.select(col("query_id"), col("qvector"))), Seq("query_id"))
        .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"))
      TopK.topKPerGroup(exact, Seq("query_id"), "id", "dist", k)
    }
  }

  /** UNCAPPED scan of the quantized codes — FAISS `scalar` is a
    * range-search index: the mask is applied to the quantized distances of
    * every row, `max_k` is ignored, strict `<` (`faiss.py:18-23`,
    * `175-183`; the range path never re-ranks, so neither does this). */
  def queryThreshold(prepared: DataFrame, queries: DataFrame,
      threshold: Double, maxK: Int): DataFrame = {
    require(lo != null, "Sq8Strategy.prepare must run before query")
    thresholdWith(prepared, queries, threshold, lo, hi)
  }

  private def thresholdWith(prepared: DataFrame, queries: DataFrame,
      threshold: Double, l: Array[Double], h: Array[Double]): DataFrame = {
    val q = maybeNormalize(queries, "qvector")
    prepared.select(col("id"), col("_codes"))
      .crossJoin(broadcast(q))
      .select(col("query_id"), col("id"),
        greatest(adcUdfWith(l, h)(col("_codes"), col("qvector")), lit(0.0))
          .as("dist"))
      .where(col("dist") < IndexStrategy.faissRangeBound(metric, threshold))
  }

  // --------------------------------------------------------------------
  // FLAT CODES disk serving (r16, verdict r15 #4 — plain SQ8's only
  // serving story was the IVF composition; the flat layout completes
  // the quantizer matrix): the shared [[CodesLayout]] discipline — one
  // id-bucketed `vectors/_gen=N/_nb=…` sub-layout, the coarse scan
  // column-pruned to (id, _codes) at 1 byte/dim, exact re-rank through
  // the (_nb, id) bucket join, and ONE sidecar
  // `_sq8_serving_meta.json` carrying the trained ranges — readers
  // ADOPT them (the codes were quantized with them), so the layout is
  // self-describing and the commit point is a single file.
  // --------------------------------------------------------------------

  /** id-hash partition fan of the vectors sub-layout */
  private val vecBuckets = 64

  private def sqMetaPath(path: String) = s"$path/_sq8_serving_meta.json"

  private def sqMetaJson(generations: Int, l: Array[Double],
      h: Array[Double]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("family", name)
    root.put("metric", metric.name)
    root.put("dim", l.length)
    root.put("vec_buckets", vecBuckets)
    root.put("generations", generations)
    val loArr = root.putArray("lo"); l.foreach(loArr.add)
    val hiArr = root.putArray("hi"); h.foreach(hiArr.add)
    mapper.writeValueAsString(root)
  }

  private def validateSqServing(
      path: String): com.fasterxml.jackson.databind.JsonNode = {
    require(graft.core.FsIO.exists(sqMetaPath(path)),
      s"no committed SQ8 serving layout at $path (missing " +
        "_sq8_serving_meta.json — an interrupted writeServingIndex; " +
        "re-run it)")
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.core.FsIO.read(sqMetaPath(path)))
    Seq("family", "metric", "dim", "vec_buckets", "generations", "lo",
      "hi").foreach { f =>
      require(meta.get(f) != null,
        s"layout at $path has no recorded '$f' — unrecognized sidecar")
    }
    require(meta.get("family").asText() == name,
      s"layout at $path was written by family " +
        s"'${meta.get("family").asText()}'; this instance serves '$name'")
    require(meta.get("metric").asText() == metric.name,
      s"layout at $path was built for metric " +
        s"${meta.get("metric").asText()}; this instance serves ${metric.name}")
    meta
  }

  private def rangesOf(meta: com.fasterxml.jackson.databind.JsonNode):
      (Array[Double], Array[Double]) = {
    def arr(f: String) = {
      val n = meta.get(f)
      (0 until n.size()).map(n.get(_).asDouble()).toArray
    }
    (arr("lo"), arr("hi"))
  }

  override def writeServingIndex(prepared: DataFrame, path: String): Unit = {
    require(lo != null, "prepare must run before writeServingIndex")
    CodesLayout.writeServing(
      prepared.withColumn("_nb", VectorBuckets.nb(vecBuckets)), path,
      "_sq8_serving_meta.json", sqMetaJson(generations = 1, lo, hi))
  }

  /** the two-stage kernel over an arbitrary slice of the layout rows
    * with the SIDECAR's ranges — shared by the plain and filtered disk
    * paths */
  private def queryOver(vecs: DataFrame,
      meta: com.fasterxml.jackson.databind.JsonNode, queries: DataFrame,
      k: Int): DataFrame = {
    val (l, h) = rangesOf(meta)
    val q = maybeNormalize(queries, "qvector")
    val coarse = TopK.topKPerGroup(
      vecs.select(col("id"), col("_codes"))
        .crossJoin(broadcast(q))
        .select(col("query_id"), col("id"),
          greatest(adcUdfWith(l, h)(col("_codes"), col("qvector")),
            lit(0.0)).as("dist")),
      Seq("query_id"), "id", "dist", if (rerank) k * rerankFactor else k)
    if (!rerank) coarse
    else TopK.topKPerGroup(
      VectorBuckets.rerank(vecs, q, coarse.select("query_id", "id"),
        meta.get("vec_buckets").asInt(), metric),
      Seq("query_id"), "id", "dist", k)
  }

  override def queryFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val meta = validateSqServing(path)
    queryOver(CodesLayout.committed(spark, path,
      meta.get("generations").asInt()), meta, queries, k)
  }

  /** [[queryThreshold]] off the layout — the family's UNCAPPED FAISS
    * range-search contract (quantized mask, strict `<`, max_k ignored)
    * over the committed (id, _codes) scan with the sidecar's ranges. */
  override def supportsDiskThreshold: Boolean = true
  override def queryThresholdFromDisk(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, threshold: Double, maxK: Int): DataFrame = {
    val meta = validateSqServing(path)
    val (l, h) = rangesOf(meta)
    thresholdWith(CodesLayout.committed(spark, path,
      meta.get("generations").asInt()), queries, threshold, l, h)
  }

  /** pre-filter serving: predicate before the quantized kernel, pushed
    * into the column-pruned scan; re-rank joins survivors only. */
  override def supportsDiskFiltered: Boolean = true
  override def queryFilteredFromDisk(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int,
      predicate: org.apache.spark.sql.Column): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val meta = validateSqServing(path)
    queryOver(CodesLayout.committed(spark, path,
      meta.get("generations").asInt()).where(predicate), meta, queries, k)
  }

  override def supportsDiskDelete: Boolean = true
  override def deleteFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, rows: DataFrame, tag: String): Long =
    DiskServing.withDeleteLease(spark, path, tag) {
      val meta = validateSqServing(path)
      CodesLayout.deleteIds(spark, path, meta.get("vec_buckets").asInt(),
        meta.get("generations").asInt(), rows)
    }

  /** append as a committed `_gen=N` generation: quantize-with-trained-
    * ranges is FAISS `add` after `train`; the instance's ranges must
    * EQUAL the sidecar's — the grown prepared frame is scored with the
    * instance's kernel, so a mismatch would silently diverge memory
    * from layout. */
  override def supportsDiskAppend: Boolean = true
  override def appendToServing(spark: org.apache.spark.sql.SparkSession,
      path: String, prevPrepared: DataFrame, newRows: DataFrame,
      tag: String): DataFrame = {
    val meta = validateSqServing(path)
    require(lo != null, "prepare must run before append")
    val (l, h) = rangesOf(meta)
    require(java.util.Arrays.equals(l, lo) &&
        java.util.Arrays.equals(h, hi),
      s"layout at $path was quantized with different ranges than this " +
        "instance holds — load the owning index before appending")
    val first = newRows.select(size(col("vector"))).limit(1).collect()
    if (first.isEmpty) // idle micro-batch: a safe no-op
      return prevPrepared.unionByName(
        prepare(newRows.withColumn("id", col("id").cast("long"))))
    require(first.head.getInt(0) == meta.get("dim").asInt(),
      s"appended vectors have dim ${first.head.getInt(0)}; the layout " +
        s"at $path was quantized at dim ${meta.get("dim").asInt()}")
    val inc = prepare(newRows.withColumn("id", col("id").cast("long")))
      .cache()
    try {
      CodesLayout.appendGeneration(spark, path, tag,
        () => validateSqServing(path).get("generations").asInt(),
        inc.withColumn("_nb", VectorBuckets.nb(
          meta.get("vec_buckets").asInt())),
        newGens => graft.core.FsIO.write(sqMetaPath(path),
          sqMetaJson(newGens, l, h)))
      prevPrepared.unionByName(inc)
    } finally inc.unpersist()
  }

  override def supportsCompaction: Boolean = true
  override protected def doCompactServing(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val meta = validateSqServing(path)
    val gens = meta.get("generations").asInt()
    if (gens <= 1) return // already compact
    val (l, h) = rangesOf(meta)
    CodesLayout.compact(spark, path, gens,
      () => graft.core.FsIO.write(sqMetaPath(path), sqMetaJson(1, l, h)))
  }

  /** retrain the per-dimension ranges on the layout's live rows (the
    * one learned artifact — `_codes` is re-quantized by the fresh
    * prepare); same shape as [[PqStrategy.rebuildServingAs]] */
  override def supportsRebuild: Boolean = true
  override protected def doRebuildServing(spark: org.apache.spark.sql.SparkSession,
      path: String): DiskServing.Rebuilt = {
    val meta = validateSqServing(path)
    // localCheckpoint, not cache: the swap rewrites this frame's source
    // files ([[IvfStrategy.rebuildCells]] argument)
    val rows = CodesLayout.committed(spark, path,
        meta.get("generations").asInt())
      .drop("_gen", "_nb", "_codes").localCheckpoint()
    val fresh = this.copy()
    val prepared = fresh.prepare(rows)
    fresh.writeServingIndex(prepared, path)
    DiskServing.Rebuilt(fresh, rows, prepared)
  }

  /** the maintenance fence's committed counters ([[DiskServing]]) */
  override def committedCounts(spark: org.apache.spark.sql.SparkSession,
      path: String): Map[String, Int] =
    Map("del" -> 0, // delete leases never spend: any present = in flight
    "gen" -> graft.core.Generations.sidecarCount(
      s"$path/_sq8_serving_meta.json", "generations"))

  override def fsckServing(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    ServingFsck.codesLayout(spark, path, "_sq8_serving_meta.json",
      Seq("family", "metric", "dim", "vec_buckets", "generations",
        "lo", "hi"), name)
}
