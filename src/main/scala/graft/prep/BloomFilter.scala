package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom filter (Bloom 1970) as plain DataFrame ops — the MEMBERSHIP
  * companion to [[CountMin]] (frequencies) and [[HyperLogLog]] (distinct
  * counts): a constant-size, mergeable set summary with one-sided error
  * (never a false negative, false-positive rate ~ (1-e^{-kn/m})^k).
  *
  * Representation: the filter is a table of SET BIT POSITIONS (<= m rows,
  * one BIGINT each) rather than a packed bitmask. That keeps every
  * operation a relational one — build is one explode + distinct, merge of
  * two filters is distinct-union (bitwise OR on bitmasks == set union on
  * position tables), and membership is a join — so the 100 TB shapes fall
  * out: the filter is bounded by construction (never Heaps-growing like
  * the key set it summarizes), AQE broadcasts it at runtime, and the
  * probe stream never shuffles.
  *
  * Why this matters for decontamination at scale: the exact benchmark
  * gram-set join ([[graft.QueriesPipeline]] q_contamination) must move
  * the full eval gram SET; a bloom of the same set is a fixed m-row
  * frame no matter how many benchmarks fold in, and docs it clears
  * (the overwhelming majority) are cleared by a broadcast probe alone —
  * only bloom-positive grams need the exact confirm join.
  *
  * Hashing: the [[CountMin]] idiom — ONE md5 per item, the k bit
  * positions taken as disjoint 32-bit hex slices of the digest
  * (Kirsch–Mitzenmacher one-hash construction; k <= 4 slices from a
  * 128-bit digest). Hex-prefix-to-long via `conv` is the
  * cross-engine-exact idiom (strpos fold on the DuckDB side), so the
  * oracle replays the filter bit-for-bit.
  */
object BloomFilter {

  /** the k bit positions of an item: position j = hex32(md5(item)[8j..8j+8))
    * mod m */
  def positions(item: Column, k: Int, m: Int): Column = {
    require(k >= 1 && k <= 4, s"k must be in [1,4], got $k")
    require(m >= 1, s"m must be >= 1, got $m")
    val h = md5(item.cast("binary"))
    array((0 until k).map(j =>
      conv(substring(h, 1 + 8 * j, 8), 16, 10).cast("long") % m): _*)
  }

  /** item stream -> set-bit table (`pos`: BIGINT, <= m rows). One md5 +
    * one explode (×k) + one distinct; map-side partial aggregation
    * collapses each task's stream to <= m positions before the shuffle. */
  def build(items: DataFrame, itemCol: String, k: Int, m: Int): DataFrame =
    items.select(explode(positions(col(itemCol), k, m)).as("pos")).distinct()

  /** Persist a filter as one GENERATION of a snapshot directory
    * (`_batch` partition, dynamic overwrite) — the same snapshot design
    * as [[CountMin.saveGeneration]]. Bloom's merge (distinct union ==
    * bitwise OR) is IDEMPOTENT, so unlike count-min a replayed append
    * could never corrupt the state — the generation scheme is kept
    * anyway for a uniform ingest loop, bounded re-writes (a replayed
    * batch re-writes <= m rows, not the union), and one-sweep
    * compaction. */
  def saveGeneration(filter: DataFrame, path: String, tag: String): Unit =
    filter.withColumn("_batch", lit(tag))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch").parquet(path)

  /** the running filter = distinct union over every saved generation
    * (requires at least one generation on disk); <= m rows by
    * construction regardless of how many generations accumulated. */
  def loadState(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    graft.core.Generations.readSwapSafe(spark, path).select("pos").distinct()

  /** Fold every generation into one — the OR-merge (distinct union)
    * materialized once ([[graft.core.Generations]] swap protocol). */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    graft.core.Generations.compact(spark, path, loadState(spark, path))

  /** Probe a candidate stream: keeps the rows whose item has ALL k bit
    * positions set (the bloom-positive subset — a superset of the true
    * members, never missing one). Plan shape: candidates explode to k
    * position rows, join the <= m-row filter (AQE broadcasts it —
    * bounded by construction, deliberately unhinted), and a count-per-row
    * aggregate keeps full hits; the probe stream itself never shuffles
    * more than its k-exploded projection. */
  def mightContain(filter: DataFrame, candidates: DataFrame, itemCol: String,
      k: Int, m: Int): DataFrame = {
    val keyCols = candidates.columns.map(col).toSeq
    candidates
      .select(keyCols :+ explode(positions(col(itemCol), k, m)).as("pos"): _*)
      .join(filter, "pos")
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("_hits"))
      .where(col("_hits") === k)
      .drop("_hits")
  }
}
