package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog (Flajolet et al. 2007) as plain DataFrame ops: the
  * distinct-count sketch is an m-row register table built by ONE bounded
  * hash aggregate over the raw item stream — no pre-distinct, CONSTANT
  * size at any corpus scale, mergeable by register-wise max (spec-pinned)
  * — the companion to [[CountMin]] (frequencies) for the other running
  * aggregate a 100 TB ingest keeps: "how many distinct n-grams / URLs /
  * doc fingerprints so far" without a Heaps-growing distinct table.
  *
  * Cross-engine determinism (the part that lets a DuckDB oracle replay
  * the ESTIMATE, not just the registers): the register sum
  * sum_j 2^-r_j is kept as an exact BIGINT numerator
  * S = sum_j 2^(43-r_j) over denominator 2^43 (r_j <= 43, so every term
  * is an integer; S < 2^49 fits exactly), and the final estimate
  * alpha_m * m^2 * 2^43 / S is literal multiplications and ONE
  * correctly-rounded IEEE division — no floating-point summation (whose
  * rounding is accumulation-order-dependent and differs across engines)
  * and no ln/pow. The standard small-range linear-counting correction
  * needs ln, so it is deliberately omitted; callers should size m so the
  * expected cardinality is >> 2.5m (see [[estimate]]).
  *
  * Hashing: hex48(md5(item)) — top 6 bits select one of m=64 registers,
  * the low 42 bits w give the rank r = 43 - bitlen(w) (= leading zeros
  * in 42 bits + 1, 43 when w = 0), computed with `bin()` string length,
  * exact on both engines.
  */
object HyperLogLog {

  /** registers per bucket: m = 64 fixed (6-bit bucket index). */
  val m = 64
  private val low42 = 4398046511104L // 2^42

  /** raw item stream -> (bucket, r) register table, at most m rows. One
    * md5 + one hash aggregate; map-side partial max collapses each task
    * to <= m rows before the shuffle. */
  def registers(items: DataFrame, itemCol: String): DataFrame = {
    val hv = conv(substring(md5(col(itemCol).cast("binary")), 1, 12),
      16, 10).cast("long")
    items.select(hv.as("hv"))
      .select(expr(s"hv div $low42").as("bucket"),
        (col("hv") % low42).as("w"))
      .select(col("bucket"),
        when(col("w") === 0, lit(43L))
          .otherwise(lit(43L) - length(bin(col("w")))).as("r"))
      .groupBy("bucket").agg(max("r").as("r"))
  }

  /** merge register snapshots: register-wise max. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy("bucket").agg(max("r").as("r"))

  /** [[registers]] per GROUP: one bounded hash aggregate keyed on
    * (group, bucket) — at most m rows per group, so the whole register
    * table is m·|groups| no matter the stream size. The per-group
    * composition of the sketch family (the grouped sibling of the
    * bottom-k group sampler). */
  def registersBy(items: DataFrame, itemCol: String,
      groupCol: String): DataFrame = {
    val hv = conv(substring(md5(col(itemCol).cast("binary")), 1, 12),
      16, 10).cast("long")
    items.select(col(groupCol), hv.as("hv"))
      .select(col(groupCol), expr(s"hv div $low42").as("bucket"),
        (col("hv") % low42).as("w"))
      .select(col(groupCol), col("bucket"),
        when(col("w") === 0, lit(43L))
          .otherwise(lit(43L) - length(bin(col("w")))).as("r"))
      .groupBy(col(groupCol), col("bucket")).agg(max("r").as("r"))
  }

  /** [[estimate]] per group over a [[registersBy]] table — same exact
    * BIGINT register sum and single IEEE division per group. */
  def estimateBy(regs: DataFrame, groupCol: String): DataFrame =
    regs.groupBy(col(groupCol)).agg(
        sum(expr("shiftleft(cast(1 as bigint), cast(43 - r as int))"))
          .cast("long").as("sp"),
        count(lit(1)).cast("long").as("nb"))
      .select(col(groupCol),
        (col("sp") + (lit(64L) - col("nb")) * lit(8796093022208L)).as("s"))
      .select(col(groupCol),
        (lit(0.7213 / (1.0 + 1.079 / 64.0)) * 4096.0
          * 8796093022208.0 / col("s").cast("double")).as("est"))

  /** Persist registers as one GENERATION of a snapshot directory —
    * same layout and replay story as [[CountMin.saveGeneration]] (max
    * merge is idempotent so HLL tolerates replay anyway; the uniform
    * generation scheme keeps the two sketch snapshots interchangeable
    * for the maintenance loop). */
  def saveGeneration(regs: DataFrame, path: String, tag: String): Unit =
    regs.withColumn("_batch", lit(tag))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch").parquet(path)

  /** the running registers = bucket-wise max over every saved
    * generation (requires at least one generation on disk). */
  def loadState(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    graft.core.Generations.readSwapSafe(spark, path).groupBy("bucket").agg(max("r").as("r"))

  /** Fold every generation into one — register-wise max materialized
    * once ([[graft.core.Generations]] swap protocol). */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    graft.core.Generations.compact(spark, path, loadState(spark, path))

  /** 1-row estimate from a register table: alpha_m * m^2 * 2^43 / S with
    * S = sum 2^(43-r) exact in BIGINT (buckets absent from the table are
    * r = 0, contributing 2^43 each). Raw HLL estimate (no small-range
    * correction — only valid when the true cardinality >> 2.5m = 160). */
  def estimate(regs: DataFrame): DataFrame =
    regs.agg(
        sum(expr("shiftleft(cast(1 as bigint), cast(43 - r as int))"))
          .cast("long").as("sp"),
        count(lit(1)).cast("long").as("nb"))
      .select((col("sp") + (lit(64L) - col("nb")) * lit(8796093022208L))
        .as("s"))
      .select((lit(0.7213 / (1.0 + 1.079 / 64.0)) * 4096.0
        * 8796093022208.0 / col("s").cast("double")).as("est"))
}
