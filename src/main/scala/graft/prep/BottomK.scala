package graft.prep

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bottom-k-by-hash order sketch — the ORDER-STATISTICS member of the
  * running-summary family ([[CountMin]]: frequencies, [[HyperLogLog]]:
  * distinct counts, [[BloomFilter]]: membership): a constant-size,
  * mergeable uniform sample from which any quantile of a value column is
  * estimated, without ever sorting the corpus.
  *
  * The construction is the classic bottom-k / KMV coordinated sample
  * (Cohen & Kaplan 2007, "Summarizing data using bottom-k sketches"):
  * hash every row's KEY to a uniform 48-bit integer and keep the k rows
  * with the smallest hashes. Because the hash is a function of the key
  * alone, the sketch is
  *   - a true uniform sample of the key population (any fixed k-subset is
  *     equally likely under a uniform hash),
  *   - MERGEABLE: bottom-k of a union == bottom-k of the union of
  *     bottom-k's (spec-pinned), so per-shard / per-day sketches combine
  *     without revisiting data, and
  *   - REPLAY-IDEMPOTENT: re-observing rows changes nothing (same key →
  *     same hash; [[merge]] dedups on the hash), which makes the
  *     streaming maintenance loop exactly-once for free, like bloom's OR.
  *
  * Plan shape: the k-smallest selection is `ORDER BY hv LIMIT k`, which
  * Spark plans as TakeOrderedAndProject — a per-partition bounded top-k
  * heap + a k-way merge of k-row partials, NOT a global sort; only
  * k × partitions rows ever leave the map side. At 100 TB the sketch is
  * the only order statistic kept (the exact-quantile column the test
  * query publishes next to it is the small-sf anchor, same stance as
  * q_hll_distinct's exact distinct count).
  *
  * Hashing: hex12(md5(key)) → BIGINT via `conv` — the repo's
  * cross-engine-exact idiom, so a DuckDB oracle replays the SAMPLE
  * MEMBERSHIP bit-for-bit (`ORDER BY the same fold LIMIT k`).
  */
object BottomK {

  /** uniform 48-bit hash of the sample key: hex12(md5(key)). */
  def hashOf(key: Column): Column =
    conv(substring(md5(key.cast("string").cast("binary")), 1, 12), 16, 10)
      .cast("long")

  /** rows -> sketch table `(hv BIGINT, value BIGINT)`, <= k rows: the k
    * rows with the smallest key hashes. TakeOrderedAndProject (bounded
    * per-partition heap), never a global sort. */
  def sketch(rows: DataFrame, keyCol: String, valueCol: String,
      k: Int): DataFrame =
    rows.select(hashOf(col(keyCol)).as("hv"),
        col(valueCol).cast("long").as("value"))
      .orderBy("hv", "value").limit(k)

  /** merge sketch snapshots: union, dedup re-observed keys by hash
    * (idempotent under replay), re-take the k smallest. */
  def merge(a: DataFrame, b: DataFrame, k: Int): DataFrame =
    a.union(b).dropDuplicates("hv").orderBy("hv", "value").limit(k)

  /** Persist a sketch as one GENERATION of a snapshot directory —
    * identical layout/replay story to [[CountMin.saveGeneration]] /
    * [[BloomFilter.saveGeneration]] (a replayed batch overwrites only its
    * own `_batch` partition, and [[merge]]'s hash-dedup makes the
    * combined state insensitive to replay anyway). */
  def saveGeneration(sk: DataFrame, path: String, tag: String): Unit =
    sk.withColumn("_batch", lit(tag))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch").parquet(path)

  /** the running sketch = bottom-k over every saved generation (requires
    * at least one generation on disk); <= k rows regardless of how many
    * generations accumulated. */
  def loadState(spark: SparkSession, path: String, k: Int): DataFrame =
    graft.core.Generations.readSwapSafe(spark, path).select("hv", "value")
      .dropDuplicates("hv").orderBy("hv", "value").limit(k)

  /** Fold every generation into one — the bottom-k re-selection
    * materialized once ([[graft.core.Generations]] swap protocol). */
  def compact(spark: SparkSession, path: String, k: Int): Unit =
    graft.core.Generations.compact(spark, path, loadState(spark, path, k))

  /** Approximate quantiles from a sketch: one scalar aggregate packs the
    * <= k sample values into a sorted array, then each requested fraction
    * p selects the element at 1-based rank ⌊p·(ns−1)⌋+1 (lower /
    * type-1 quantile — pure element selection, no interpolation, so the
    * estimate is always a value that actually occurs and the oracle
    * comparison is integer-exact). Output: `(p DOUBLE, approx BIGINT,
    * ns BIGINT)`, one row per p. No Window, no join — the whole
    * computation after the bounded selection touches <= k rows. */
  def quantiles(sk: DataFrame, ps: Seq[Double]): DataFrame =
    sk.agg(sort_array(collect_list(col("value"))).as("_s"))
      .select(explode(array(ps.map(lit(_)): _*)).as("p"), col("_s"))
      .select(col("p"),
        element_at(col("_s"),
          (floor(col("p") * (size(col("_s")) - 1)) + 1).cast("int"))
          .as("approx"),
        size(col("_s")).cast("long").as("ns"))
}
