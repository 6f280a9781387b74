package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance for the `_batch`-generation snapshot stores (count-min /
  * HLL / bloom / bottom-k sketches, the MinHash and BQ signature tables,
  * the segment-df table): streaming ingest appends one generation per
  * micro-batch, so generations accumulate without bound — reads stay
  * CORRECT (every loadState re-aggregates across generations) but pay a
  * growing listing/footer cost. Compaction folds them back to one.
  *
  * Protocol (the classic compact-and-swap): the merged state is written to
  * a staging dir as a single `_batch=<tag>` generation, then swapped in
  * with two directory renames. The staging write is re-runnable (crash
  * before the swap leaves the live store untouched); the swap window is
  * two metadata operations, not a data rewrite. On an object store without
  * atomic rename the swap step becomes the store's commit primitive —
  * the staging-write discipline is the part that carries.
  *
  * Streaming compatibility: the compacted generation's tag is outside the
  * `stream-<id>` namespace, so a later replayed micro-batch still targets
  * (and REPLACES) its own generation id — replaying a batch whose rows
  * were already folded into the compact generation double-counts it, so
  * compact a stream's snapshot only past the checkpoint's committed
  * offset (operational rule, same as any log-compaction system).
  */
object Generations {

  /** Replace every generation at `path` with `state` as the single
    * `_batch=<tag>` generation. `state` must be the fully merged state
    * READ FROM `path` (the family's loadState); `partitionCols` are any
    * extra partition columns below `_batch` (e.g. the signature table's
    * `_band`). `withStaging` runs against the STAGING dir after the data
    * write and before the swap — stores whose sidecar lives at the root
    * (the signature table's `_sig_meta.json`) must write it here, so the
    * promoted directory is born complete and no crash window exists
    * where the live store lacks its sidecar (the advice-r15 BQ
    * compaction lesson, applied to the snapshot stores). */
  def compact(spark: SparkSession, path: String, state: DataFrame,
      tag: String = "compact", partitionCols: Seq[String] = Nil,
      withStaging: String => Unit = _ => ()): Unit = {
    val staging = path.stripSuffix("/") + "__compacting"
    state.withColumn("_batch", lit(tag))
      .write.mode("overwrite")
      .partitionBy(("_batch" +: partitionCols): _*).parquet(staging)
    withStaging(staging)
    swapInto(spark, path, staging)
  }

  /** The two-rename swap of the compact protocol, factored out so other
    * compact-and-swap layouts (e.g. the HNSW disk index's generation
    * fold) share the exact discipline: retire live → promote staging,
    * roll back on a failed promote, delete the retired dir last. */
  def swapInto(spark: SparkSession, path: String, staging: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new Path(path)
    val st = new Path(staging)
    val fs = live.getFileSystem(conf)
    val old = new Path(path.stripSuffix("/") + "__old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(live, old))
      throw new java.io.IOException(s"compact: cannot retire $live")
    if (!fs.rename(st, live)) {
      // roll back: put the live store back before failing
      fs.rename(old, live)
      throw new java.io.IOException(s"compact: cannot promote $st")
    }
    fs.delete(old, true)
  }

  /** True iff `path` holds at least one `_batch=` generation. Exists so
    * ingest paths can distinguish the legitimate first-batch case (no
    * store written yet → empty history) from everything else WITHOUT a
    * catch-all on AnalysisException, which would also swallow schema or
    * corruption errors as "first batch" and silently under-count history
    * (advice r11). If the live dir is absent but a compaction staging or
    * retired dir is present, a [[compact]] is mid-swap — that is NOT
    * first-batch, so fail loudly rather than hand back empty history.
    * A live dir holding REAL content but no `_batch=` child (a corrupt,
    * truncated, or foreign-layout store at this path) also throws
    * (advice r12) — only an absent dir, an empty dir, or one holding
    * nothing but write metadata (`_SUCCESS`, `_temporary`, dotfiles)
    * means no history; anything else silently re-admits the
    * under-counting failure this method exists to eliminate. */
  def hasGenerations(spark: SparkSession, path: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new Path(path)
    val fs = live.getFileSystem(conf)
    if (fs.exists(live)) {
      val kids = fs.listStatus(live).map(_.getPath.getName)
      if (kids.exists(_.startsWith("_batch="))) true
      // EXACT metadata whitelist, not a prefix test: every graft
      // partition layout is underscore-prefixed too (_pk= / _nb= /
      // _centroid= / _gen=), so "starts with _" would classify a
      // misconfigured path pointing at a real index layout as
      // "legitimately no history" — the silent under-count this method
      // exists to refuse
      else if (kids.forall(n => n == "_SUCCESS" || n == "_temporary" ||
          n.startsWith(".")))
        false // empty or write-metadata-only → legitimately no history yet
      else throw new IllegalStateException(
        s"snapshot store $path exists but holds no _batch= generation " +
          s"(found: ${kids.take(5).mkString(", ")}) — unrecognized store " +
          "layout, refusing to treat it as an empty history")
    } else {
      val old = new Path(path.stripSuffix("/") + "__old")
      val staging = new Path(path.stripSuffix("/") + "__compacting")
      if (fs.exists(old) || fs.exists(staging))
        throw new IllegalStateException(
          s"snapshot store $path is mid-compaction (staging/retired dir " +
            "present but live dir absent); retry after the swap completes")
      false
    }
  }
}
