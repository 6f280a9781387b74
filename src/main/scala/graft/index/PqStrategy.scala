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
  extends IndexStrategy with DiskServing {
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
    adcTopKWith(prepared, queries, kTop, codebooks, subDims)
  }

  /** the ADC scan parameterized by codebooks — the disk-serving readers
    * adopt the LAYOUT's codebooks (self-consistent with the codes it
    * holds), the in-memory path passes the instance's */
  private def adcTopKWith(prepared: DataFrame, queries: DataFrame,
      kTop: Int, cb: Array[Array[Array[Double]]],
      dims: Array[Int]): DataFrame = {
    val spark = prepared.sparkSession
    val q = maybeNormalize(queries, "qvector")
      .select(col("query_id").cast("long"), col("qvector"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
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

  // --------------------------------------------------------------------
  // FLAT CODES disk serving (r16, verdict r15 #1/#4 — plain PQ was the
  // transform family with no serving face, which also blocked OPQ's):
  // ONE id-bucketed sub-layout `vectors/_gen=N/_nb=…` holds the full
  // prepared rows (id, vector, _pq, extra metadata), so the coarse ADC
  // scan is the SAME parquet column-pruned to (id, _pq) — m bytes of
  // payload per row — and the exact re-rank fetches raw vectors through
  // the DPP-keyed (_nb, id) join (the BQ vectors/ discipline,
  // [[VectorBuckets]]). The sidecar `_pq_serving_meta.json` carries the
  // ENTIRE trained state — codebooks included (and the rotation, for
  // the OPQ family riding this layout) — in ONE file, so the layout is
  // self-describing (readers ADOPT the sidecar's codebooks: the codes
  // were encoded with them, and an untrained instance can serve) and
  // the commit point is a single sidecar write: data first, sidecar
  // last, a crashed write fails the next reader loudly and a re-run
  // heals it. Rewrites stage THE WHOLE layout and swap, so there is no
  // window where new codes sit under old codebooks.
  //
  // All maintenance ops are family-parameterized (`*As`) so
  // [[OpqStrategy]] delegates with its own tag — an OPQ layout (rotated
  // vectors!) must never be served by a plain PQ instance with
  // plausible-looking results, and vice versa.
  // --------------------------------------------------------------------

  /** id-hash partition fan of the vectors sub-layout */
  private val vecBuckets = 64

  private def pqMetaPath(path: String) = s"$path/_pq_serving_meta.json"

  private def pqMetaJson(family: String, dim: Int, generations: Int,
      codebooksJson: String, rotationJson: Option[String]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("family", family)
    root.put("metric", metric.name)
    root.put("m", m)
    root.put("nbits", nbits)
    root.put("dim", dim)
    root.put("vec_buckets", vecBuckets)
    root.put("generations", generations)
    root.put("codebooks", codebooksJson)
    rotationJson.foreach(root.put("rotation", _))
    mapper.writeValueAsString(root)
  }

  /** read + validate the sidecar (family tag and metric; every reader
    * field present) — returns the parsed node, whose `codebooks` (and
    * `rotation`, for OPQ) the readers adopt */
  private[index] def validatePqServing(path: String,
      family: String): com.fasterxml.jackson.databind.JsonNode = {
    require(graft.core.FsIO.exists(pqMetaPath(path)),
      s"no committed codes serving layout at $path (missing " +
        "_pq_serving_meta.json — an interrupted writeServingIndex; " +
        "re-run it)")
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.core.FsIO.read(pqMetaPath(path)))
    Seq("family", "metric", "dim", "vec_buckets", "generations",
      "codebooks").foreach { f =>
      require(meta.get(f) != null,
        s"layout at $path has no recorded '$f' — unrecognized sidecar")
    }
    require(meta.get("family").asText() == family,
      s"layout at $path was written by family " +
        s"'${meta.get("family").asText()}'; this instance serves '$family'")
    require(meta.get("metric").asText() == metric.name,
      s"layout at $path was built for metric " +
        s"${meta.get("metric").asText()}; this instance serves ${metric.name}")
    meta
  }

  /** committed generations of the vectors sub-layout */
  private def servingVectors(spark: org.apache.spark.sql.SparkSession,
      path: String,
      meta: com.fasterxml.jackson.databind.JsonNode): DataFrame =
    CodesLayout.committed(spark, path, meta.get("generations").asInt())

  /** [[DiskServing.writeServingIndex]], family-parameterized for the
    * OPQ delegation: `_gen=0` of the id-bucketed vectors plus the
    * one-file sidecar (codebooks and the caller's rotation inside),
    * through the shared [[CodesLayout]] write (rewrites stage the whole
    * layout — sidecar included — and swap). */
  private[index] def writeServingAs(prepared: DataFrame, path: String,
      family: String, rotationJson: Option[String]): Unit = {
    require(codebooks != null,
      "prepare must run before writeServingIndex")
    val dim = prepared.select(size(col("vector"))).limit(1)
      .collect()(0).getInt(0)
    CodesLayout.writeServing(
      prepared.withColumn("_nb", VectorBuckets.nb(vecBuckets)), path,
      "_pq_serving_meta.json", pqMetaJson(family, dim, generations = 1,
        PqCore.toJson(codebooks, subDims), rotationJson))
  }

  override def writeServingIndex(prepared: DataFrame, path: String): Unit =
    writeServingAs(prepared, path, name, None)

  /** [[DiskServing.rebuildServing]] for the codes layouts, family-
    * parameterized for the OPQ delegation: the layout's live rows (aux
    * columns stripped, `unrotate` mapping them back to the space the
    * fresh prepare expects — identity here, the rotation inverse for
    * OPQ) retrain a FRESH instance's codebooks, and the retrained
    * layout stages + swaps in whole through the family's own
    * writeServingIndex (sidecar included — the new trained state rides
    * with the new codes). */
  private[index] def rebuildServingAs(spark: org.apache.spark.sql.SparkSession,
      path: String, family: String, fresh: IndexStrategy with DiskServing,
      unrotate: DataFrame => DataFrame): DiskServing.Rebuilt = {
    val meta = validatePqServing(path, family)
    // localCheckpoint, not cache: the swap rewrites this frame's source
    // files ([[IvfStrategy.rebuildCells]] argument)
    val rows = unrotate(CodesLayout.committed(spark, path,
        meta.get("generations").asInt()).drop("_gen", "_nb", "_pq"))
      .localCheckpoint()
    val prepared = fresh.prepare(rows)
    fresh.writeServingIndex(prepared, path)
    DiskServing.Rebuilt(fresh, rows, prepared)
  }

  override def supportsRebuild: Boolean = true
  override protected def doRebuildServing(spark: org.apache.spark.sql.SparkSession,
      path: String): DiskServing.Rebuilt =
    rebuildServingAs(spark, path, name, this.copy(), identity)

  private[index] def fsckCodesAs(spark: org.apache.spark.sql.SparkSession,
      path: String, family: String,
      extraFields: Seq[String] = Nil): DataFrame =
    ServingFsck.codesLayout(spark, path, "_pq_serving_meta.json",
      Seq("family", "metric", "dim", "vec_buckets", "generations",
        "codebooks") ++ extraFields, family)

  /** the maintenance fence's committed counters ([[DiskServing]]) */
  override def committedCounts(spark: org.apache.spark.sql.SparkSession,
      path: String): Map[String, Int] =
    Map("del" -> 0, // delete leases never spend: any present = in flight
    "gen" -> graft.core.Generations.sidecarCount(
      s"$path/_pq_serving_meta.json", "generations"))

  override def fsckServing(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = fsckCodesAs(spark, path, name)

  /** top-k off the layout with the SIDECAR's codebooks: coarse ADC over
    * the (id, _pq)-pruned scan; optional exact re-rank through the
    * (_nb, id) bucket join — decision for decision [[query]] when the
    * layout was written by an identically-trained instance. `queries`
    * must already be in the family's query space (OPQ rotates before
    * delegating). */
  private[index] def queryFromDiskAs(
      spark: org.apache.spark.sql.SparkSession, path: String,
      family: String, queries: DataFrame, kTop: Int): DataFrame = {
    require(kTop >= 1, s"k must be >= 1, got $kTop")
    val meta = validatePqServing(path, family)
    queryOver(servingVectors(spark, path, meta), meta, queries, kTop)
  }

  /** the two-stage kernel over an arbitrary slice of the layout rows —
    * shared by the plain, filtered, and threshold disk paths */
  private def queryOver(vecs: DataFrame,
      meta: com.fasterxml.jackson.databind.JsonNode, queries: DataFrame,
      kTop: Int): DataFrame = {
    val (cb, dims) = PqCore.fromJson(meta.get("codebooks").asText())
    if (!rerank) adcTopKWith(vecs, queries, kTop, cb, dims)
    else {
      val cands = adcTopKWith(vecs, queries, kTop * rerankFactor, cb, dims)
        .select("query_id", "id")
      TopK.topKPerGroup(
        VectorBuckets.rerank(vecs, maybeNormalize(queries, "qvector"),
          cands, meta.get("vec_buckets").asInt(), metric),
        Seq("query_id"), "id", "dist", kTop)
    }
  }

  override def queryFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int): DataFrame =
    queryFromDiskAs(spark, path, name, queries, k)

  /** [[queryThreshold]] off the layout — the ANN threshold contract
    * (top-max_k, then the strict `<` mask), mirroring the in-memory
    * order exactly. */
  private[index] def queryThresholdFromDiskAs(
      spark: org.apache.spark.sql.SparkSession, path: String,
      family: String, queries: DataFrame, threshold: Double,
      maxK: Int): DataFrame =
    // max(maxK, 1), NOT an empty early-return: mirrors the in-memory
    // [[queryThreshold]] exactly (the facade gates maxK >= 1 anyway)
    queryFromDiskAs(spark, path, family, queries, math.max(maxK, 1))
      .where(col("dist") < threshold).drop("rank")

  override def supportsDiskThreshold: Boolean = true
  override def queryThresholdFromDisk(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, threshold: Double, maxK: Int): DataFrame =
    queryThresholdFromDiskAs(spark, path, name, queries, threshold, maxK)

  /** pre-filter serving: the predicate gates the layout rows BEFORE the
    * coarse ADC pass (metadata rides in the layout, simple comparisons
    * push into the scan), and the re-rank joins survivors only —
    * matching the in-memory `queryFiltered` (= [[query]] of the
    * filtered frame) decision for decision. */
  private[index] def queryFilteredFromDiskAs(
      spark: org.apache.spark.sql.SparkSession, path: String,
      family: String, queries: DataFrame, k: Int,
      predicate: org.apache.spark.sql.Column): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val meta = validatePqServing(path, family)
    queryOver(servingVectors(spark, path, meta).where(predicate), meta,
      queries, k)
  }

  override def supportsDiskFiltered: Boolean = true
  override def queryFilteredFromDisk(
      spark: org.apache.spark.sql.SparkSession, path: String,
      queries: DataFrame, k: Int,
      predicate: org.apache.spark.sql.Column): DataFrame =
    queryFilteredFromDiskAs(spark, path, name, queries, k, predicate)

  /** delete by id: the layout is id-bucketed, so the touched `_nb`
    * partitions are COMPUTED from the ids and the (generation, bucket)
    * pairs that actually hold them come from one bucket-pruned,
    * id-semi-joined probe — I/O proportional to the batch (the BQ
    * vectors-side discipline, minus the postings table this layout
    * doesn't have). */
  private[index] def deleteFromDiskAs(
      spark: org.apache.spark.sql.SparkSession, path: String,
      family: String, rows: DataFrame,
      tag: String = graft.core.Generations.defaultWriterTag): Long =
    DiskServing.withDeleteLease(spark, path, tag) {
      val meta = validatePqServing(path, family)
      CodesLayout.deleteIds(spark, path, meta.get("vec_buckets").asInt(),
        meta.get("generations").asInt(), rows)
    }

  override def supportsDiskDelete: Boolean = true
  override def deleteFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, rows: DataFrame, tag: String): Long =
    deleteFromDiskAs(spark, path, name, rows, tag)

  /** append as a committed `_gen=N` generation — encode-with-trained-
    * codebooks is FAISS `add` after `train`; the instance's codebooks
    * must EQUAL the sidecar's (bitwise, via the shared JSON encoding):
    * the returned grown prepared frame is scored with the instance's
    * tables, so a mismatch would silently diverge memory from layout.
    * `mkInc` is the caller family's increment encoder (OPQ rotates
    * first). Id freshness is guarded in both directions through the
    * bucket-pruned read; sidecar commits last; replays overwrite their
    * own generation. */
  private[index] def appendToServingAs(
      spark: org.apache.spark.sql.SparkSession, path: String,
      family: String, prevPrepared: DataFrame, newRows: DataFrame,
      mkInc: DataFrame => DataFrame,
      rotationJson: Option[String], tag: String): DataFrame = {
    val meta = validatePqServing(path, family)
    require(codebooks != null, "prepare must run before append")
    require(PqCore.toJson(codebooks, subDims)
        == meta.get("codebooks").asText(),
      s"layout at $path was built with different codebooks than this " +
        "instance holds — load the owning index before appending")
    val fan = meta.get("vec_buckets").asInt()
    val dim = meta.get("dim").asInt()
    val first = newRows.select(size(col("vector"))).limit(1).collect()
    if (first.isEmpty) // idle micro-batch: a safe no-op
      return prevPrepared.unionByName(
        mkInc(newRows.withColumn("id", col("id").cast("long"))))
    require(first.head.getInt(0) == dim,
      s"appended vectors have dim ${first.head.getInt(0)}; the layout " +
        s"at $path was encoded at dim $dim")
    val inc = mkInc(newRows.withColumn("id", col("id").cast("long")))
      .cache()
    try {
      CodesLayout.appendGeneration(spark, path, tag,
        () => validatePqServing(path, family).get("generations").asInt(),
        inc.withColumn("_nb", VectorBuckets.nb(fan)),
        newGens => graft.core.FsIO.write(pqMetaPath(path),
          pqMetaJson(family, dim, newGens,
            meta.get("codebooks").asText(), rotationJson)))
      prevPrepared.unionByName(inc)
    } finally inc.unpersist()
  }

  override def supportsDiskAppend: Boolean = true
  override def appendToServing(spark: org.apache.spark.sql.SparkSession,
      path: String, prevPrepared: DataFrame, newRows: DataFrame,
      tag: String): DataFrame =
    appendToServingAs(spark, path, name, prevPrepared, newRows, prepare,
      None, tag)

  /** fold committed generations back to `_gen=0`: the data fold stages
    * and swaps; the sidecar rewrite preserves its trained state
    * verbatim and only resets the count — a crash between the two
    * leaves a count HIGHER than the generations present, which every
    * reader's `_gen <` filter tolerates, and a re-run heals. */
  private[index] def compactServingAs(
      spark: org.apache.spark.sql.SparkSession, path: String,
      family: String): Unit = {
    val meta = validatePqServing(path, family)
    val gens = meta.get("generations").asInt()
    if (gens <= 1) return // already compact
    CodesLayout.compact(spark, path, gens,
      () => graft.core.FsIO.write(pqMetaPath(path), pqMetaJson(family,
        meta.get("dim").asInt(), generations = 1,
        meta.get("codebooks").asText(),
        Option(meta.get("rotation")).map(_.asText()))))
  }

  override def supportsCompaction: Boolean = true
  override protected def doCompactServing(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = compactServingAs(spark, path, name)
}
