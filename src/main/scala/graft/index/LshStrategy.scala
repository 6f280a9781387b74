package graft.index

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.{TopK, VectorFunctions}

/** Random-projection LSH strategy — the Spark-native stand-in for the
  * reference's ANN backend family (ANNOY's random-projection forest,
  * `/root/reference/vicinity/backends/annoy.py:25-134`; FAISS `lsh`,
  * `faiss.py:93-100`; capability-equivalence note in SURVEY.md §2.3).
  *
  * Cosine: sign-LSH — `nTables` independent `nBits`-bit signatures from
  * seeded Gaussian hyperplanes; a store row and a query collide if any
  * table's full signature matches (`nTables` ≙ ANNOY's `trees`).
  * Euclidean: E2LSH — per table, `nBits` seeded projections quantized by
  * width `w`, hashed together.
  *
  * Multi-probe (`nProbes` > 0, Lv et al. 2007, "Multi-Probe LSH"):
  * each QUERY additionally probes, per table, the `nProbes` buckets
  * reached by flipping the single signature position with the smallest
  * margin — |projection| for sign-LSH, distance to the nearer
  * quantization boundary (stepping toward it) for E2LSH. Probing is
  * query-side only: the INDEX is unchanged (`prepare` does not depend on
  * `nProbes`), so a multi-probe strategy can serve from an already-built
  * single-probe index at zero extra build cost, trading a bounded factor
  * of candidate volume — ≤ (1+nProbes)× — for recall that is provably a
  * superset of the single-probe result (the base bucket is always
  * probed).
  *
  * Physical shape: the index is the store exploded to `(table, bucket)`
  * posting rows WITHOUT the vector payload (bucket joins move only ids);
  * candidates are re-ranked with the exact kernel against the original
  * store. Collision join is an equi-join on (table, bucket) — broadcast on
  * the query side, so the store never shuffles.
  *
  * Like the reference's ANN backends, only cosine/euclidean are supported
  * (`hnsw.py:25-29`, `annoy.py:28-31`, `voyager.py:25-29`), threshold
  * queries use strict `<` and a `max_k` cap (`hnsw.py:107-114`), and
  * delete is unsupported (`hnsw.py:103-105`).
  */
case class LshStrategy(metric: Metric, nTables: Int = 16, nBits: Int = 6,
    w: Double = 1.0, seed: Long = 42L, nProbes: Int = 0)
    extends IndexStrategy with DiskServing {
  require(metric == Metric.Cosine || metric == Metric.Euclidean,
    s"Metric '${metric.name}' is not supported by the LSH backend.")
  require(nProbes >= 0 && nProbes <= nBits,
    s"nProbes must be in [0, nBits=$nBits], got $nProbes")
  val name = "lsh"

  /** Seeded projection matrix: nTables × nBits hyperplanes, lazily sized to
    * the data dimension on first use. Gaussian entries, deterministic. */
  private def planes(dim: Int): Array[Array[Array[Double]]] = {
    val rnd = new Random(seed)
    Array.fill(nTables, nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }
  private def offsets(dim: Int): Array[Array[Double]] = {
    val rnd = new Random(seed + 1)
    Array.fill(nTables, nBits)(rnd.nextDouble() * w)
  }

  /** vector -> one bucket hash per table; planes generated ONCE on the
    * driver (deterministic from seed+dim) and shipped in the closure.
    * Always probe-free (np = 0): the STORE hashes one bucket per table
    * regardless of nProbes — multi-probe is query-directed only. */
  private def bucketUdf(dim: Int) = {
    val isCosine = metric == Metric.Cosine
    val nt = nTables; val nb = nBits; val ww = w
    val pl = planes(dim)
    val off = offsets(dim)
    udf { (v: Seq[Double]) =>
      LshStrategy.buckets(v.toArray, pl, off, isCosine, nt, nb, ww, 0)
    }
  }

  /** query -> (1+nProbes) bucket hashes per table, base bucket first, then
    * the single-position flips in ascending-margin order (the perturbation
    * sequence of Lv et al. 2007 truncated to 1-flips — for the short
    * signatures used here, T·nProbes single flips cover the probe budget
    * before any 2-flip would be reached). SAME core as [[bucketUdf]]
    * ([[LshStrategy.buckets]]), so base buckets are bit-identical by
    * construction — the superset guarantee is structural, not a
    * two-copies-kept-in-sync invariant. */
  private def probeBucketsUdf(dim: Int) = {
    val isCosine = metric == Metric.Cosine
    val nt = nTables; val nb = nBits; val ww = w; val np = nProbes
    val pl = planes(dim)
    val off = offsets(dim)
    udf { (v: Seq[Double]) =>
      LshStrategy.buckets(v.toArray, pl, off, isCosine, nt, nb, ww, np)
    }
  }

  @transient private var cachedDim: Int = -1

  /** hashes are per-row from seeded planes: hash the increment only */
  override def prepareIncrement(prevPrepared: DataFrame, newRows: DataFrame,
      fullStore: DataFrame): DataFrame =
    prevPrepared.unionByName(prepare(newRows))

  def prepare(store: DataFrame): DataFrame = {
    cachedDim = store.select(size(col("vector"))).head.getInt(0)
    store.withColumn("_buckets",
      bucketUdf(cachedDim)(col("vector").cast("array<double>")))
  }

  /** exploded (table, bucket) postings without the vector payload */
  private def postings(prepared: DataFrame): DataFrame =
    prepared.select(col("id"), posexplode(col("_buckets")))
      .toDF("id", "table", "bucket")

  /** distinct (query, id) bucket-collision pairs — the set the exact
    * kernel re-ranks. `private[graft]` so the evaluate harness can persist
    * ONE materialization and serve both scoring and the rows_scanned proxy
    * from it (verdict r3: `scanVolume` re-ran this whole postings join
    * moments after `query` had computed it). */
  private[graft] def candidateFrame(prepared: DataFrame,
      queries: DataFrame): DataFrame = candidatePairs(prepared, queries)

  private def candidatePairs(prepared: DataFrame, queries: DataFrame): DataFrame = {
    val dim = if (cachedDim > 0) cachedDim
      else queries.select(size(col("qvector"))).head.getInt(0)
    // (1+nProbes) hashes per table, grouped by table: pos / (1+nProbes)
    // recovers the table index for the equi-join (nProbes = 0 reduces to
    // the plain one-bucket-per-table posting)
    val qPost = queries
      .withColumn("_buckets",
        probeBucketsUdf(dim)(col("qvector").cast("array<double>")))
      .select(col("query_id"), posexplode(col("_buckets")))
      .toDF("query_id", "pos", "bucket")
      .select(col("query_id"),
        (col("pos") / (1 + nProbes)).cast("int").as("table"), col("bucket"))
    postings(prepared)
      .join(broadcast(qPost), Seq("table", "bucket"))
      .select("query_id", "id").distinct()
  }

  /** rows scored = candidates surviving the bucket joins (re-rank work) */
  override def scanVolume(prepared: DataFrame, queries: DataFrame): Long =
    candidatePairs(prepared, queries).count()

  /** exact re-rank of a (query_id, id) candidate frame against the store */
  private def rerank(prepared: DataFrame, queries: DataFrame,
      cands: DataFrame): DataFrame = {
    val d = VectorFunctions.distance(metric)(col("vector"), col("qvector"))
    cands
      .join(prepared.select(col("id"), col("vector")), Seq("id"))
      .join(broadcast(queries.select(col("query_id"), col("qvector"))),
        Seq("query_id"))
      .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"))
  }

  private def candidates(prepared: DataFrame, queries: DataFrame): DataFrame =
    rerank(prepared, queries, candidatePairs(prepared, queries))

  def query(prepared: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    TopK.topKPerGroup(candidates(prepared, queries), Seq("query_id"), "id",
      "dist", k)
  }

  /** top-k served from an externally persisted [[candidateFrame]] — lets a
    * caller that also needs the candidate COUNT pay for the bucket joins
    * once */
  private[graft] def queryFromCandidates(prepared: DataFrame,
      queries: DataFrame, cands: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    TopK.topKPerGroup(rerank(prepared, queries, cands), Seq("query_id"), "id",
      "dist", k)
  }

  /** EXACT mode (the LSH family's oracle anchor, mirroring
    * [[HnswStrategy.queryExhaustive]]): candidate set = EVERY (query, id)
    * pair, so the exact re-rank the ANN path already performs IS brute
    * force and the emitted top-k is provably the exact top-k — the
    * nTables → ∞ limit of bucket recall made explicit. Exercises the
    * same [[rerank]] distance join and TopK rank plumbing as [[query]];
    * only the bucket-collision pruning is bypassed. */
  def queryExhaustive(prepared: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val all = prepared.select(col("id"))
      .crossJoin(queries.select("query_id"))
    queryFromCandidates(prepared, queries, all, k)
  }

  def queryThreshold(prepared: DataFrame, queries: DataFrame,
      threshold: Double, maxK: Int): DataFrame = {
    if (maxK <= 0) return IndexStrategy.emptyThreshold(queries)
    val capped = TopK.topKPerGroup(candidates(prepared, queries),
      Seq("query_id"), "id", "dist", maxK)
    capped.where(col("dist") < threshold).drop("rank") // strict <: hnsw.py:111
  }

  // --------------------------------------------------------------------
  // Disk-resident serving (verdict r12 #4 — the one index family that
  // raised on writeServingIndex despite its naturally partitionable
  // (table, bucket) hash-table structure; reference users coming from
  // annoy.py:99-104 save/load expect the family to persist-and-serve).
  //
  // Layout:
  //   postings/  (id, table, bucket) WITHOUT the vector payload,
  //              partitioned by ONE combined key
  //              `_pk = table·subBuckets + pmod(bucket, subBuckets)`
  //              (the BQ-MIH `_pk` lesson: a query batch's (table,
  //              bucket) probe PAIRS prune directories exactly, where
  //              two separate partition columns would prune on the
  //              cross product of the per-column IN-lists), sorted by
  //              bucket within files so the pushed `bucket IN (...)`
  //              filter skips row groups via parquet min/max stats.
  //   vectors/   the full prepared rows (id, vector, extra metadata
  //              columns) WITHOUT the bucket arrays, partitioned by
  //              `_nb = pmod(xxhash64(id), vecBuckets)` — the rerank
  //              join runs on (_nb, id), so Spark's dynamic partition
  //              pruning can skip vector directories no candidate
  //              touches; filtered serving's predicate pushes into
  //              this same scan.
  //   _lsh_meta.json  writer config (metric/tables/bits/w/seed + the
  //              partition fans) — a reader with mismatched hash
  //              config would probe buckets that do not line up, so
  //              serving REQUIRES the instance to match the sidecar
  //              (the appendGraphIndex discipline).
  //
  // At 100 TB: a query batch enumerates its probe keys driver-side
  // (bounded by |queries| × nTables × (1+nProbes), never by the store),
  // reads ~|probed buckets|/|all buckets| of the postings table via
  // directory pruning, and reranks only colliding candidates. Delete is
  // a serving-layer MAINTENANCE op ([[deleteFromDisk]], the BQ/IVF
  // convention — the reference's FACADE delete stays BASIC-only,
  // hnsw.py:103-105, and `Vicinity.delete` enforces that gate).
  //
  // Inserts land as GENERATIONS (verdict r13 #3): each sub-layout is
  // partitioned by (_gen, fan key); [[appendServingIndex]] writes the
  // hashed increment as `_gen=N` and commits the sidecar count last, so
  // readers (which union `_gen < generations`) never see a crashed
  // append and a replay overwrites its own generation. Postings rows are
  // independent per id, so unlike the graph family no latest-wins merge
  // is needed.
  // --------------------------------------------------------------------

  /** per-table partition fan of the postings layout; 16 × nTables dirs */
  private val subBuckets = 16
  /** id-hash partition fan of the vectors sub-layout */
  private val vecBuckets = 64

  override def writeServingIndex(prepared: DataFrame, path: String): Unit = {
    val dim = prepared.select(size(col("vector"))).limit(1).head.getInt(0)
    // fresh-write semantics without an in-place delete
    // ([[VectorBuckets.writeFreshGeneration]]): a rewrite of an existing
    // sub-layout lands in a staging dir and swaps in, which also makes
    // compaction safe as plain rewrite-from-own-read
    VectorBuckets.writeFreshGeneration(
      postings(prepared).withColumn("_pk",
        col("table") * subBuckets + pmod(col("bucket"), lit(subBuckets))),
      "_pk", "bucket", s"$path/postings")
    VectorBuckets.writeFreshGeneration(
      prepared.drop("_buckets")
        .withColumn("_nb", VectorBuckets.nb(vecBuckets)),
      "_nb", "id", s"$path/vectors")
    writeLshMeta(path, dim, generations = 1)
    // a REWRITE of an existing layout resets the generation count while
    // swapping only the sub-layouts — stale claims must go with it
    graft.core.Generations.clearClaims(prepared.sparkSession, path)
  }

  private def writeLshMeta(path: String, dim: Int, generations: Int): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("metric", metric.name)
    root.put("n_tables", nTables)
    root.put("n_bits", nBits)
    root.put("w", w)
    root.put("seed", seed)
    root.put("dim", dim)
    root.put("sub_buckets", subBuckets)
    root.put("vec_buckets", vecBuckets)
    root.put("generations", generations)
    graft.core.FsIO.write(s"$path/_lsh_meta.json",
      mapper.writeValueAsString(root))
  }

  /** Incremental insert COMPOSED WITH the disk layout (verdict r13 #3 —
    * in-memory LSH absorbs inserts via [[prepareIncrement]] but the
    * layout was write-once): hash ONLY the appended rows (per-row seeded
    * hashing needs no history) and land their postings and vectors as one
    * `_gen=N` generation of each sub-layout. The sidecar count commits
    * LAST, so a crashed append leaves an invisible orphan and a replay
    * overwrites it (dynamic partition overwrite) — at-least-once replay
    * stays exactly-once. Unlike the graph family there is no adjacency to
    * re-cap: postings rows are independent, so readers simply union
    * committed generations — no latest-wins merge, no compaction
    * required for correctness (compaction remains an I/O optimization —
    * [[compactServing]] folds the generations back to one). Returns the
    * PREPARED increment (hashed once, id cast to long — advice r14: the
    * facade path previously re-prepared the raw rows, paying a second
    * hash pass and typing the in-memory ids differently from the
    * layout's). */
  def appendServingIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, newRows: DataFrame,
      tag: String = graft.core.Generations.defaultWriterTag): DataFrame = {
    val meta = readMeta(path) // hash config must match the layout
    require(meta.get("generations") != null,
      s"layout at $path predates the generation layout — rewrite it with " +
        "writeServingIndex before appending")
    val dim = meta.get("dim").asInt()
    // partition fans come FROM THE SIDECAR, like every read path
    // (review r14): appending under the instance constants onto a layout
    // recorded with different fans would write rows the (_nb, id) /
    // (_pk, bucket) joins can never find
    val sb = meta.get("sub_buckets").asInt()
    val nb = meta.get("vec_buckets").asInt()
    // an empty increment is a safe no-op (idle micro-batches must not
    // kill a stream on the dim probe below)
    val first = newRows.select(size(col("vector"))).limit(1).collect()
    if (first.isEmpty) // empty prepared-shaped frame (prepare's dim probe
      return newRows.withColumn("id", col("id").cast("long")) // would throw)
        .withColumn("_buckets", array().cast("array<bigint>"))
    val newDim = first.head.getInt(0)
    require(newDim == dim,
      s"appended vectors have dim $newDim; the layout at $path was " +
        s"hashed at dim $dim")
    // cached: the increment feeds four actions (dup check, bucket
    // enumeration, clash check, two generation writes) — hash it once.
    // id cast BEFORE hashing: xxhash64 hashes int and long differently,
    // and the layout's vectors side is long-typed
    val newKeys = prepare(newRows.withColumn("id", col("id").cast("long")))
      .withColumn("_nb", VectorBuckets.nb(nb))
      .cache()
    try {
      // id freshness guard, BOTH directions (review r14): the batch must
      // not collide with the layout NOR with itself — a duplicate id
      // would serve twice from the rerank join either way.
      val selfDup = newKeys.groupBy("id").agg(count(lit(1)).as("_c"))
        .where(col("_c") > 1).limit(1).collect()
      require(selfDup.isEmpty,
        s"append batch contains duplicate ids (e.g. id " +
          s"${selfDup.headOption.map(_.getLong(0)).getOrElse(-1L)})")
      // claim the append slot before reading the committed state the
      // clash guard depends on (verdict r16 #1 — two concurrent
      // appenders must not dynamic-overwrite the same `_gen=N`)
      val gens = graft.core.Generations.claimAppendGeneration(spark,
        path, tag,
        () => readMeta(path).get("generations").asInt())
      try {
        // …vs the layout: partition-pruned existence check — the read
        // touches only the append batch's buckets, never the store
        val nbs = newKeys.select("_nb").distinct().collect()
          .map(_.getLong(0)).map(java.lang.Long.valueOf).toSeq
        val clash = spark.read.parquet(s"$path/vectors")
          .where(col("_gen") < gens && col("_nb").isin(nbs: _*))
          .select("id")
          .join(newKeys.select("id"), Seq("id"), "left_semi")
          .limit(1).collect()
        require(clash.isEmpty,
          s"append contains ids already present in the layout at $path " +
            s"(e.g. id " +
            s"${clash.headOption.map(_.getLong(0)).getOrElse(-1L)})")
        VectorBuckets.writeGeneration(
          postings(newKeys).withColumn("_pk",
            col("table") * sb + pmod(col("bucket"), lit(sb))),
          "_pk", "bucket", s"$path/postings", gen = gens)
        VectorBuckets.writeGeneration(newKeys.drop("_buckets"),
          "_nb", "id", s"$path/vectors", gen = gens)
        writeLshMeta(path, dim, generations = gens + 1) // the commit point
      } catch {
        case e: Throwable =>
          graft.core.Generations.releaseClaim(spark, path, gens, tag)
          throw e
      }
      newKeys.drop("_nb")
    } finally newKeys.unpersist()
  }

  /** the facade's `insertIntoServing` capability: land the increment as
    * a committed generation ([[appendServingIndex]]) and return the
    * grown prepared frame — built from the SAME prepared increment the
    * append hashed (advice r14: one prepare pass, and the in-memory ids
    * carry the layout's long typing) */
  override def supportsDiskAppend: Boolean = true
  override def appendToServing(spark: org.apache.spark.sql.SparkSession,
      path: String, prevPrepared: DataFrame, newRows: DataFrame,
      tag: String): DataFrame =
    prevPrepared.unionByName(appendServingIndex(spark, path, newRows, tag))

  /** Fail fast on a hash-config mismatch — probing with different
    * planes/quantization than the layout was hashed with would silently
    * return garbage candidates, so every disk read verifies first. */
  private def readMeta(path: String): com.fasterxml.jackson.databind.JsonNode = {
    require(graft.core.FsIO.exists(s"$path/_lsh_meta.json"),
      s"no LSH serving layout at $path (missing _lsh_meta.json)")
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.core.FsIO.read(s"$path/_lsh_meta.json"))
    require(meta.get("metric").asText() == metric.name &&
        meta.get("n_tables").asInt() == nTables &&
        meta.get("n_bits").asInt() == nBits &&
        meta.get("w").asDouble() == w &&
        meta.get("seed").asLong() == seed,
      s"layout at $path was hashed with " +
        s"(metric=${meta.get("metric").asText()}, " +
        s"tables=${meta.get("n_tables").asInt()}, " +
        s"bits=${meta.get("n_bits").asInt()}, w=${meta.get("w").asDouble()}, " +
        s"seed=${meta.get("seed").asLong()}); this instance has " +
        s"(${metric.name}, $nTables, $nBits, $w, $seed) — serve with a " +
        "matching configuration")
    meta
  }

  /** committed generations only (`_gen` < the sidecar count): an orphan
    * generation from a crashed append is invisible to every reader;
    * pre-generation layouts (no `_gen` column) read unchanged */
  private def committedGen(df: DataFrame,
      meta: com.fasterxml.jackson.databind.JsonNode): DataFrame = {
    val g = meta.get("generations")
    if (g == null || !df.columns.contains("_gen")) df
    else df.where(col("_gen") < g.asInt())
  }

  /** the vectors sub-layout, ready for (_nb, id) candidate joins */
  private def diskVectors(spark: org.apache.spark.sql.SparkSession,
      path: String,
      meta: com.fasterxml.jackson.databind.JsonNode): DataFrame =
    committedGen(spark.read.parquet(s"$path/vectors"), meta)

  /** Candidate (query_id, id) pairs off the pruned postings read: probe
    * keys enumerated driver-side from the QUERY batch, pushed into the
    * scan twice — `_pk IN` prunes directories, `bucket IN` skips row
    * groups — then the same broadcast equi-join as the in-memory path.
    * Probes exactly the buckets [[candidatePairs]] probes, so the
    * candidate set (and therefore every served result) is identical to
    * the in-memory path's, decision for decision (spec-pinned). */
  private def diskCandidates(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame,
      meta: com.fasterxml.jackson.databind.JsonNode): DataFrame = {
    // partition fans come FROM THE SIDECAR, not the compiled-in
    // constants (reader-adopts-writer-config, the graph-family
    // discipline): a reader built with retuned fans would otherwise
    // compute _pk / _nb values for directories that do not exist and
    // silently return zero candidates
    val dim = meta.get("dim").asInt()
    val sb = meta.get("sub_buckets").asInt()
    val qPost = queries
      .withColumn("_buckets",
        probeBucketsUdf(dim)(col("qvector").cast("array<double>")))
      .select(col("query_id"), posexplode(col("_buckets")))
      .toDF("query_id", "pos", "bucket")
      .select(col("query_id"),
        (col("pos") / (1 + nProbes)).cast("int").as("table"), col("bucket"))
    val probes = qPost.select("table", "bucket").distinct().collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val probePks = probes
      .map { case (t, b) => t.toLong * sb + Math.floorMod(b, sb.toLong) }
      .distinct.toSeq
    val probeVals = probes.map(_._2).distinct.toSeq
    committedGen(spark.read.parquet(s"$path/postings"), meta)
      .where(col("_pk").isin(probePks: _*) &&
        col("bucket").isin(probeVals: _*))
      .join(broadcast(qPost), Seq("table", "bucket"))
      .select("query_id", "id").distinct()
  }

  /** exact rerank of disk candidates through the shared
    * [[VectorBuckets.rerank]] (_nb, id) join (DPP-prunable), same kernel
    * as [[rerank]]; the fan comes from the sidecar */
  private def rerankFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, cands: DataFrame,
      meta: com.fasterxml.jackson.databind.JsonNode): DataFrame =
    VectorBuckets.rerank(diskVectors(spark, path, meta), queries, cands,
      meta.get("vec_buckets").asInt(), metric)

  /** Top-k served from the [[writeServingIndex]] layout — identical
    * results to [[query]] on the in-memory prepared frame (the disk path
    * probes the same buckets and reranks with the same kernel). */
  override def queryFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val meta = readMeta(path)
    val q = queries.withColumn("qvector", col("qvector").cast("array<double>"))
    val cands = diskCandidates(spark, path, q, meta)
    TopK.topKPerGroup(rerankFromDisk(spark, path, q, cands, meta),
      Seq("query_id"), "id", "dist", k)
  }

  /** [[queryExhaustive]] served from the layout's vectors side: all-pairs
    * candidates, so the rerank IS brute force and the result provably the
    * exact top-k — the family's oracle anchor THROUGH the disk round trip
    * (pins the partitioned write, payload recovery, rerank join, rank),
    * mirroring [[HnswStrategy]]'s exhaustive disk sibling. */
  def queryExhaustiveFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val meta = readMeta(path)
    val q = queries.withColumn("qvector", col("qvector").cast("array<double>"))
    val d = VectorFunctions.distance(metric)(col("vector"), col("qvector"))
    val scored = diskVectors(spark, path, meta).select(col("id"), col("vector"))
      .crossJoin(broadcast(q.select(col("query_id"), col("qvector"))))
      .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"))
    TopK.topKPerGroup(scored, Seq("query_id"), "id", "dist", k)
  }

  /** [[queryThreshold]] off the same layout — strict `<` and the max_k
    * cap (hnsw.py:107-114), same pruned candidate read. */
  override def supportsDiskThreshold: Boolean = true
  override def queryThresholdFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, threshold: Double,
      maxK: Int): DataFrame = {
    if (maxK <= 0) return IndexStrategy.emptyThreshold(queries)
    val meta = readMeta(path)
    val q = queries.withColumn("qvector", col("qvector").cast("array<double>"))
    val cands = diskCandidates(spark, path, q, meta)
    val capped = TopK.topKPerGroup(
      rerankFromDisk(spark, path, q, cands, meta),
      Seq("query_id"), "id", "dist", maxK)
    capped.where(col("dist") < threshold).drop("rank")
  }

  /** Pre-filter serving: candidates ∩ predicate-survivors — identical to
    * the in-memory [[IndexStrategy.queryFiltered]] set (filtering the
    * postings before the bucket join and filtering the vectors at the
    * rerank select the same (query, id) pairs), with the predicate
    * pushed into the vectors scan (metadata columns ride in the
    * layout). */
  override def supportsDiskFiltered: Boolean = true
  override def queryFilteredFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int,
      predicate: org.apache.spark.sql.Column): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val meta = readMeta(path)
    val q = queries.withColumn("qvector", col("qvector").cast("array<double>"))
    val cands = diskCandidates(spark, path, q, meta)
    val scored = VectorBuckets.rerank(
      diskVectors(spark, path, meta).where(predicate), q, cands,
      meta.get("vec_buckets").asInt(), metric)
    TopK.topKPerGroup(scored, Seq("query_id"), "id", "dist", k)
  }

  /** Fold the committed append generations back to a single `_gen=0`
    * (verdict r14 #3 — the I/O optimization [[appendServingIndex]]'s
    * scaladoc promised): each sub-layout's committed union rewrites via
    * the staging + rename-swap discipline
    * ([[VectorBuckets.writeFreshGeneration]] — the staging write
    * finishes READING the live files before the swap replaces them, so
    * rewrite-from-own-read is safe), and the sidecar's generation count
    * resets LAST. Postings/vector rows are independent per id, so the
    * fold is a plain union — no latest-wins merge. A crash anywhere
    * leaves a servable layout: folded sub-layouts hold every committed
    * row in `_gen=0`, which the old sidecar's `_gen < N` gate still
    * admits. Served results are identical across the fold
    * (spec-pinned); a post-compact append lands as `_gen=1`. */
  override def supportsCompaction: Boolean = true
  override protected def doCompactServing(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val meta = readMeta(path)
    val gens = Option(meta.get("generations")).map(_.asInt()).getOrElse(1)
    if (gens <= 1) return // already compact
    val dim = meta.get("dim").asInt()
    def fold(sub: String, partCol: String, sortCol: String): Unit =
      VectorBuckets.writeFreshGeneration(
        committedGen(spark.read.parquet(s"$path/$sub"), meta).drop("_gen"),
        partCol, sortCol, s"$path/$sub")
    fold("postings", "_pk", "bucket")
    fold("vectors", "_nb", "id")
    writeLshMeta(path, dim, generations = 1)
    // the count reset: spent claims must not outlive it, or the first
    // post-compact append's slot would read as foreign-claimed forever
    graft.core.Generations.clearClaims(spark, path)
  }

  /** Partition-scoped DELETE on the serving layout (verdict r14 #2 — the
    * BQ pattern applied to the (postings, vectors) pair): `rows` carries
    * `id` only. The batch's rows are fetched through the `_nb`-pruned
    * vectors read (bounded by the batch, never the store), their postings
    * `_pk` partitions are COMPUTED by re-hashing the fetched vectors with
    * the layout's own seeded planes (readMeta verified the hash config,
    * so the recomputed buckets are bit-identical to what the write
    * hashed), and both sub-layouts rewrite only the touched (generation,
    * partition) pairs — an id lives in exactly ONE generation (appends
    * refuse duplicates), so the rewrite set stays proportional to the
    * batch. POSTINGS rewrite first, vectors last (replay safety, the
    * `BqStrategy.deleteFromDisk` ordering argument: the batch's rows are
    * derived FROM the vectors side, so a crash after the vectors rewrite
    * would leave a re-run nothing to find and strand the postings
    * forever; in this order a re-run still sees the rows and finishes
    * both — the postings rewrite is idempotent). Ids absent from the
    * layout are no-ops. Returns rows removed. */
  override def supportsDiskDelete: Boolean = true
  override def deleteFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, rows: DataFrame, tag: String): Long =
      DiskServing.withDeleteLease(spark, path, tag) {
    val meta = readMeta(path)
    val nb = meta.get("vec_buckets").asInt()
    val sb = meta.get("sub_buckets").asInt()
    val dim = meta.get("dim").asInt()
    val keyed = rows.select(col("id").cast("long").as("id")).distinct()
      .withColumn("_nb", VectorBuckets.nb(nb)).cache()
    try {
      val nbs = keyed.select("_nb").distinct().collect().map(_.getLong(0))
        .map(java.lang.Long.valueOf).toSeq
      if (nbs.isEmpty) return 0L
      val vecsRaw = spark.read.parquet(s"$path/vectors")
      val hasGen = vecsRaw.columns.contains("_gen")
      val present = committedGen(vecsRaw, meta)
        .where(col("_nb").isin(nbs: _*))
        .join(keyed.select("id"), Seq("id"), "left_semi")
        .select(col("id"), col("vector").cast("array<double>"),
          col("_nb").cast("long"),
          (if (hasGen) col("_gen") else lit(0)).cast("int").as("_gen"))
        .collect()
      if (present.isEmpty) return 0L
      // re-hash the present rows driver-side (bounded by the batch) —
      // base buckets only (np = 0): the STORE posts one bucket per table
      val isCosine = metric == Metric.Cosine
      val pl = planes(dim)
      val off = offsets(dim)
      val hits = present.map { r =>
        val bks = LshStrategy.buckets(r.getSeq[Double](1).toArray, pl, off,
          isCosine, nTables, nBits, w, 0)
        val pks = bks.zipWithIndex.map { case (b, t) =>
          t.toLong * sb + Math.floorMod(b, sb.toLong) }
        (r.getInt(3), r.getLong(2), pks)
      }
      val ids = keyed.select("id")
      def grouped(vals: Array[(Int, Long)]): Map[Int, Seq[Any]] =
        vals.groupBy(_._1).map { case (g, vs) =>
          g -> vs.map(_._2).distinct.toSeq
            .map(java.lang.Long.valueOf(_): Any) }
      val pkPairs = hits.flatMap { case (g, _, pks) => pks.map(g -> _) }
      val nbPairs = hits.map { case (g, b, _) => (g, b) }
      if (hasGen) {
        PartitionRewrite.dropIdsByGen(spark, s"$path/postings", "_pk",
          grouped(pkPairs), ids, sortCol = Some("bucket"))
        val (before, after) = PartitionRewrite.dropIdsByGen(spark,
          s"$path/vectors", "_nb", grouped(nbPairs), ids,
          sortCol = Some("id"))
        before - after
      } else { // pre-generation layout: flat partition dirs
        PartitionRewrite.dropIds(spark, s"$path/postings", "_pk",
          pkPairs.map(_._2).distinct.toSeq.map(java.lang.Long.valueOf(_): Any),
          ids, sortCol = Some("bucket"))
        val (before, after) = PartitionRewrite.dropIds(spark,
          s"$path/vectors", "_nb",
          nbPairs.map(_._2).distinct.toSeq.map(java.lang.Long.valueOf(_): Any),
          ids, sortCol = Some("id"))
        before - after
      }
    } finally keyed.unpersist()
  }

  /** the doctor's extra LSH invariant: every stored id posts to every
    * table exactly once (appends hash the increment into all tables,
    * deletes remove a batch's postings from all tables), so postings
    * rows == vectors rows × n_tables — a drift means a partially-applied
    * mutation */
  /** the maintenance fence's committed counters ([[DiskServing]]) */
  override def committedCounts(spark: org.apache.spark.sql.SparkSession,
      path: String): Map[String, Int] =
    Map("del" -> 0, // delete leases never spend: any present = in flight
    "gen" -> graft.core.Generations.sidecarCount(
      s"$path/_lsh_meta.json", "generations"))

  override def fsckServing(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    import ServingFsck._
    val file = s"$path/_lsh_meta.json"
    val sc = sidecar(spark, file, Seq("metric", "n_tables", "n_bits", "w",
      "seed", "dim", "sub_buckets", "vec_buckets", "generations"))
    if (sc.exists(_.status == Fail))
      return toDf(spark, sc ++ crashLeftovers(spark, path))
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.core.FsIO.read(file))
    val gens = meta.get("generations").asInt()
    val vecs = committedOrAll(spark, s"$path/vectors", gens).select("id")
    val posts = committedOrAll(spark, s"$path/postings", gens)
    // two independent sub-layout aggregates run CONCURRENTLY, each ONE
    // job (r20: the r19 doctor ran vectors count, duplicate-id count, a
    // postings count, and a SECOND identical postings count — four
    // sequential jobs — plus a cache pin on the id set)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fVec = Future(rowsAndDuplicates(vecs, "vectors"))
    val fPosts = Future(posts.count())
    val (rowsCk, dupCk) = Await.result(fVec, Duration.Inf)
    val nPosts = Await.result(fPosts, Duration.Inf)
    toDf(spark, sc ++
      generations(spark, s"$path/vectors", gens, "vectors") ++
      generations(spark, s"$path/postings", gens, "postings") ++
      Seq(rowsCk, dupCk,
        Check("postings", "rows", Ok, nPosts),
        consistent("postings_rows_per_table", nPosts,
          rowsCk.observed * meta.get("n_tables").asInt())) ++
      claims(spark, path, gens) ++
      crashLeftovers(spark, path))
  }
}

object LshStrategy {
  /** The ONE bucket-hash core both the store and query sides use: per
    * table, the base `nBits`-position signature hash, followed by `np`
    * single-position flips in ascending-margin order (margin = |projection|
    * for sign-LSH; distance to the nearer quantization boundary, stepping
    * toward it, for E2LSH). `np = 0` emits exactly the base hashes. */
  private[index] def buckets(arr: Array[Double],
      pl: Array[Array[Array[Double]]], off: Array[Array[Double]],
      isCosine: Boolean, nt: Int, nb: Int, ww: Double,
      np: Int): Array[Long] = {
    val out = new Array[Long](nt * (1 + np))
    var t = 0
    while (t < nt) {
      val codes = new Array[Long](nb)
      val alt = new Array[Long](nb) // the flip target per position
      val margin = new Array[Double](nb)
      var b = 0
      while (b < nb) {
        var dot = 0.0
        val p = pl(t)(b)
        var i = 0
        while (i < arr.length) { dot += arr(i) * p(i); i += 1 }
        if (isCosine) {
          codes(b) = if (dot >= 0) 1L else 0L
          alt(b) = 1L - codes(b)
          margin(b) = math.abs(dot)
        } else {
          val x = (dot + off(t)(b)) / ww
          val c = math.floor(x).toLong
          codes(b) = c
          val frac = x - c
          if (frac >= 0.5) { alt(b) = c + 1; margin(b) = 1.0 - frac }
          else { alt(b) = c - 1; margin(b) = frac }
        }
        b += 1
      }
      def hashWithFlip(flip: Int): Long = {
        var h = 1125899906842597L
        var i = 0
        while (i < nb) {
          h = h * 31 + (if (i == flip) alt(i) else codes(i))
          i += 1
        }
        h
      }
      out(t * (1 + np)) = hashWithFlip(-1)
      if (np > 0) {
        val order = (0 until nb).sortBy(margin)
        var pi = 0
        while (pi < np) {
          out(t * (1 + np) + 1 + pi) = hashWithFlip(order(pi))
          pi += 1
        }
      }
      t += 1
    }
    out
  }
}
