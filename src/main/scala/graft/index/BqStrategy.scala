package graft.index

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.{TopK, VectorFunctions}

/** Binary-quantization strategy — the 1-bit end of the scalar-quantization
  * spectrum the reference exposes through FAISS (`/root/reference/vicinity/
  * backends/faiss.py:93-100` is the 8-bit `scalar` index; this is the same
  * compress-scan-refine architecture with sign bits). Each vector's
  * signature is `ceil(dim/64)` longs; the coarse pass scores candidates by
  * Hamming distance between signatures (XOR + POPCNT, codegen'd), and an
  * exact re-rank over the survivors recovers full metric precision.
  *
  * Two properties distinguish BQ from the SQ8/PQ strategies:
  *  - **Train-free.** Sign is scale-invariant, so there are no learned
  *    ranges/codebooks: `prepare` is a single narrow map, inserts quantize
  *    independently of history, and save/load has no aux state.
  *  - **Integer-exact.** Hamming distances are integers, so every BQ query
  *    mode is bit-reproducible in a relational oracle — the family is
  *    hash-checkable end to end, coarse pass included.
  *
  * Scale story: signatures are 32× smaller than float32 vectors (64 dims →
  * 8 bytes), so the coarse scan is bandwidth-cheap; and the multi-index-
  * hashing radius path ([[mihRadius]]) replaces the crossJoin scan with an
  * equi-join on 16-bit chunk keys — at 100 TB the probe join touches only
  * the store rows sharing a chunk value with some query, not every row.
  */
case class BqStrategy(metric: Metric, rerank: Boolean = true,
    rerankFactor: Int = 4) extends IndexStrategy {
  require(metric == Metric.Cosine || metric == Metric.Euclidean,
    s"Metric '${metric.name}' is not supported by the BQ backend.")
  val name = "bq"

  def prepare(store: DataFrame): DataFrame =
    maybeNormalize(store, "vector")
      .withColumn("_sig", VectorFunctions.pack_sign_bits(col("vector")))

  /** train-free: new rows pack independently of everything already indexed */
  override def prepareIncrement(prevPrepared: DataFrame, newRows: DataFrame,
      fullStore: DataFrame): DataFrame =
    prevPrepared.unionByName(prepare(newRows))

  private def packedQueries(queries: DataFrame): DataFrame =
    maybeNormalize(queries, "qvector")
      .withColumn("_qsig", VectorFunctions.pack_sign_bits(col("qvector")))

  /** coarse pass: Hamming over packed signatures, integer-deterministic */
  private def coarseTopK(prepared: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val q = packedQueries(queries)
    val pairs = prepared.select(col("id"), col("_sig"))
      .crossJoin(broadcast(q.select(col("query_id"), col("_qsig"))))
      .select(col("query_id"), col("id"),
        VectorFunctions.hamming_packed(col("_sig"), col("_qsig"))
          .cast("double").as("dist"))
    TopK.topKPerGroup(pairs, Seq("query_id"), "id", "dist", k)
  }

  /** Tie-INCLUSIVE candidate pool: every store row whose Hamming distance
    * is ≤ the pool-boundary value (the `pool`-th smallest). Hamming over
    * few dimensions ties heavily — a strict (dist, id) cut would tie-break
    * an exact duplicate of the query out of the pool purely by id (observed:
    * an inserted copy of a stored vector at dim 8, where 501 signatures
    * share 256 possible values). The boundary frame is one row per query,
    * so the re-scan filter join is a broadcast.
    */
  private def coarseCandidates(prepared: DataFrame, queries: DataFrame,
      pool: Int): DataFrame = {
    val q = packedQueries(queries)
    def pairs = prepared.select(col("id"), col("_sig"))
      .crossJoin(broadcast(q.select(col("query_id"), col("_qsig"))))
      .select(col("query_id"), col("id"),
        VectorFunctions.hamming_packed(col("_sig"), col("_qsig"))
          .cast("double").as("dist"))
    val boundary = TopK.topKPerGroup(pairs, Seq("query_id"), "id", "dist", pool)
      .groupBy("query_id").agg(max(col("dist")).as("_bound"))
    pairs.join(broadcast(boundary), Seq("query_id"))
      .where(col("dist") <= col("_bound"))
      .select("query_id", "id")
  }

  def query(prepared: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    if (!rerank) coarseTopK(prepared, queries, k)
    else {
      val q = maybeNormalize(queries, "qvector")
      val cands = coarseCandidates(prepared, queries, k * rerankFactor)
      val d = VectorFunctions.distance(metric)(col("vector"), col("qvector"))
      val exact = cands
        .join(prepared.select(col("id"), col("vector")), Seq("id"))
        .join(broadcast(q.select(col("query_id"), col("qvector"))), Seq("query_id"))
        .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"))
      TopK.topKPerGroup(exact, Seq("query_id"), "id", "dist", k)
    }
  }

  /** ANN-convention radius: Hamming-coarse candidates, exact re-rank,
    * strict `<` + max_k cap (the reference's ANN threshold shape,
    * `hnsw.py:111` et al. — the threshold is in the exact metric's units,
    * which raw Hamming is not, so the mask applies after refinement). */
  def queryThreshold(prepared: DataFrame, queries: DataFrame,
      threshold: Double, maxK: Int): DataFrame = {
    if (maxK <= 0) return IndexStrategy.emptyThreshold(queries)
    val q = maybeNormalize(queries, "qvector")
    val cands = coarseCandidates(prepared, queries, maxK * rerankFactor)
    val d = VectorFunctions.distance(metric)(col("vector"), col("qvector"))
    val exact = cands
      .join(prepared.select(col("id"), col("vector")), Seq("id"))
      .join(broadcast(q.select(col("query_id"), col("qvector"))), Seq("query_id"))
      .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"))
    TopK.topKPerGroup(exact.where(col("dist") < threshold),
      Seq("query_id"), "id", "dist", maxK)
  }

  /** Exact Hamming radius (inclusive `<= bits`, integer semantics) by
    * brute signature scan; tie-canonical (dist, id) rank capped at maxK. */
  def hammingRadius(prepared: DataFrame, queries: DataFrame, bits: Int,
      maxK: Int): DataFrame = {
    val q = packedQueries(queries)
    val pairs = prepared.select(col("id"), col("_sig"))
      .crossJoin(broadcast(q.select(col("query_id"), col("_qsig"))))
      .select(col("query_id"), col("id"),
        VectorFunctions.hamming_packed(col("_sig"), col("_qsig"))
          .cast("double").as("dist"))
      .where(col("dist") <= bits)
    TopK.topKPerGroup(pairs, Seq("query_id"), "id", "dist", maxK)
  }

  /** Multi-index-hashing radius search: the same answer as
    * [[hammingRadius]] — provably, not approximately — computed without a
    * crossJoin. Split each signature into `chunkBits`-wide chunks; by
    * pigeonhole, two signatures within `bits` Hamming distance agree to
    * within `floor(bits / numChunks)` bits on at least one chunk (Norouzi
    * et al., "Fast Search in Hamming Space with Multi-Index Hashing",
    * CVPR 2012). So: explode the store into (chunk_idx, chunk_val) rows
    * once, enumerate each query chunk's Hamming ball of radius
    * `floor(bits/numChunks)` as probe keys, equi-join, and verify
    * survivors with one full-signature Hamming check. The probe side is
    * tiny (≤ 1 + B + B·(B−1)/2 values/chunk at ball radius 2) and
    * broadcast, so the big side never shuffles — candidate generation is
    * a broadcast hash join, and only candidate rows (those sharing a
    * near-identical chunk with some query) reach the verify.
    */
  def mihRadius(prepared: DataFrame, queries: DataFrame, bits: Int,
      maxK: Int, chunkBits: Int = 16): DataFrame = {
    require(chunkBits > 0 && 64 % chunkBits == 0,
      s"mihRadius: chunkBits must divide 64, got $chunkBits")
    val dim = prepared.select(F.size(col("vector"))).limit(1)
      .collect()(0).getInt(0)
    val perWord = 64 / chunkBits
    val numChunks = (dim + chunkBits - 1) / chunkBits
    val ballR = bits / numChunks
    require(ballR <= 2,
      s"mihRadius: ball radius $ballR > 2 (bits=$bits over $numChunks chunks)" +
        " — narrow chunks or use hammingRadius")
    val mask = (1L << chunkBits) - 1

    def chunkExtract(sig: String) = array((0 until numChunks).map { c =>
      shiftrightunsigned(element_at(col(sig), c / perWord + 1),
        (c % perWord) * chunkBits).bitwiseAND(mask)
    }: _*)

    // store side: (id, _sig, chunk_idx, chunk_val), 1 row per chunk — a
    // narrow generate, no shuffle; at scale this layout is written once
    // and bucketed by (chunk_idx, chunk_val)
    val storeChunks = prepared.select(col("id"), col("_sig"))
      .withColumn("_chunks", chunkExtract("_sig"))
      .select(col("id"), col("_sig"),
        posexplode(col("_chunks")).as(Seq("chunk_idx", "chunk_val")))

    // query side: every chunk value within ballR bit-flips of the query's
    // chunk
    val ball = udf { (v: Long) =>
      val out = scala.collection.mutable.ArrayBuffer(v)
      if (ballR >= 1)
        for (i <- 0 until chunkBits) out += (v ^ (1L << i))
      if (ballR >= 2)
        for (i <- 0 until chunkBits; j <- (i + 1) until chunkBits)
          out += (v ^ (1L << i) ^ (1L << j))
      out.toSeq
    }
    val q = packedQueries(queries)
    val probeKeys = q.select(col("query_id"), col("_qsig"))
      .withColumn("_chunks", chunkExtract("_qsig"))
      .select(col("query_id"), col("_qsig"),
        posexplode(col("_chunks")).as(Seq("chunk_idx", "chunk_val")))
      .withColumn("chunk_val", explode(ball(col("chunk_val"))))

    val candidates = storeChunks
      .join(broadcast(probeKeys), Seq("chunk_idx", "chunk_val"))
      .select(col("query_id"), col("id"), col("_sig"), col("_qsig"))
      .dropDuplicates("query_id", "id")

    val verified = candidates.select(col("query_id"), col("id"),
        VectorFunctions.hamming_packed(col("_sig"), col("_qsig"))
          .cast("double").as("dist"))
      .where(col("dist") <= bits)
    TopK.topKPerGroup(verified, Seq("query_id"), "id", "dist", maxK)
  }

  /** coarse scan volume: every (row, query) signature pair */
  override def scanVolume(prepared: DataFrame, queries: DataFrame): Long =
    prepared.count() * queries.count()
}
