package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch (Cormode & Muthukrishnan 2005) as plain DataFrame
  * ops: the sketch is a (depth × width) cell table built by ONE bounded
  * hash aggregate over the item stream — CONSTANT size regardless of
  * corpus scale, and mergeable by cell-wise sum (the sketch of a union
  * is the cell-wise sum of the parts' sketches, spec-pinned). That pair
  * of properties is what makes it the 100 TB running aggregate: a daily
  * ingest job keeps a 4096-row table instead of a Heaps-growing exact
  * count table, merges snapshots with a 4096-row union+sum, and answers
  * frequency queries with a guaranteed one-sided error
  * (estimate >= true count, overshoot ~ total-mass/width w.h.p.).
  *
  * Hashing: ONE md5 per item, the depth row-hashes taken as disjoint
  * 32-bit hex slices of the digest (Kirsch & Mitzenmacher's one-hash
  * trick; hashing d separate salted md5s measured ~2x slower on the
  * bigram stream). Hex-prefix-to-long is the cross-engine-exact idiom
  * (conv on the Spark side, strpos fold on the DuckDB side, parity
  * proven by q_priority_sample), so the oracle replays the sketch
  * cell-for-cell. depth <= 4 (a 128-bit digest holds four 32-bit
  * slices). */
object CountMin {

  /** per-row cells of an item: element d = hex32(md5(item)[8d..8d+8))
    * mod width */
  def cells(item: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && depth <= 4, s"depth must be in [1,4], got $depth")
    val h = md5(item.cast("binary"))
    array((0 until depth).map(d =>
      conv(substring(h, 1 + 8 * d, 8), 16, 10).cast("long") % width): _*)
  }

  /** (item, weight) stream -> (d, cell, cnt) sketch table with at most
    * depth × width rows. One md5 + one explode (×depth) + one hash
    * aggregate; map-side partial aggregation collapses the stream to
    * ≤ depth×width rows per task before any shuffle. */
  def build(items: DataFrame, itemCol: String, nCol: String,
      depth: Int, width: Int): DataFrame =
    items.select(col(nCol),
        posexplode(cells(col(itemCol), depth, width)).as(Seq("d", "cell")))
      .groupBy("d", "cell").agg(sum(nCol).cast("long").as("cnt"))

  /** Persist a sketch as one GENERATION of a snapshot directory
    * (`_batch` partition, dynamic overwrite): re-writing the same tag
    * REPLACES that generation and touches nothing else — the replay
    * guard that keeps the NON-idempotent cell-sum merge exactly-once
    * when a streaming micro-batch crashes between its state write and
    * its checkpoint commit (same design as Dedup's signature snapshot).
    * [[loadState]] re-sums across generations; a periodic compaction can
    * fold them into one without changing any answer (cell-wise sum is
    * associative — the mergeability spec). */
  def saveGeneration(sketch: DataFrame, path: String, tag: String): Unit =
    sketch.withColumn("_batch", lit(tag))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch").parquet(path)

  /** the running sketch = cell-wise sum over every saved generation
    * (requires at least one generation on disk). */
  def loadState(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    graft.core.Generations.readSwapSafe(spark, path)
      .groupBy("d", "cell").agg(sum("cnt").cast("long").as("cnt"))

  /** Fold every generation into one (`graft.core.Generations` swap
    * protocol) — the cell-sum merge materialized once instead of on every
    * read. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    graft.core.Generations.compact(spark, path, loadState(spark, path))

  /** point-query a candidate frame through the sketch: est(item) =
    * min over the depth rows of the item's cell counts. The join's right
    * side is the ≤ depth×width-row sketch — AQE broadcasts it at runtime
    * (size-based, no hint needed; the frame is bounded by construction,
    * not Heaps-growing). Extra columns of `candidates` are carried
    * through (first() per item — they are constant within an item). */
  def estimate(sketch: DataFrame, candidates: DataFrame, itemCol: String,
      depth: Int, width: Int): DataFrame = {
    val carry = candidates.columns.filterNot(_ == itemCol)
    candidates.select(col(itemCol) +: carry.map(col) :+
        posexplode(cells(col(itemCol), depth, width)).as(Seq("d", "cell")): _*)
      .join(sketch, Seq("d", "cell"))
      .groupBy(itemCol)
      .agg(min("cnt").as("est"), carry.map(c => first(c).as(c)): _*)
  }
}
