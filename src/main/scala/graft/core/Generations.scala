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

  // ------------------------------------------------------------------
  // Append-generation claims (verdict r16 #1 — multi-writer safety).
  //
  // The append discipline every layout family shares — read the
  // sidecar's committed count N, write `_gen=N`, bump the sidecar to
  // N+1 — is exactly-once for ONE writer (replays overwrite their own
  // generation), but two CONCURRENT writers both read N, both write
  // `_gen=N` with dynamic partition overwrite, and silently clobber
  // each other's partitions before both "commit" — rows lost under a
  // sidecar that claims them. The claim protocol serializes the slot:
  // before writing `_gen=N`, a writer must atomically create the claim
  // file `<layout>/_claims/gen-N` carrying its writer tag.
  //
  //  - creation uses the filesystem's create-exclusive primitive
  //    (atomic on HDFS and on object stores with conditional create;
  //    on a local FS the exists-then-create window is nanoseconds and
  //    single-machine — the contract that carries to a fleet is the
  //    HDFS one);
  //  - the SAME tag re-claiming its own slot succeeds — a replay of a
  //    crashed append (crash after the data write, before the sidecar
  //    commit) reuses its claim and overwrites its own generation, so
  //    the at-least-once-stays-exactly-once discipline is unchanged;
  //  - a DIFFERENT tag finding the slot claimed re-reads the sidecar:
  //    if it advanced, the holder committed — retry at the new slot;
  //    if not, the holder is in-flight or crashed — fail loudly with
  //    both tags named (the caller retries later, replays under the
  //    holder's tag, or breaks the claim after operator inspection);
  //  - spent claims (gen < committed) stay behind as an audit trail —
  //    one tiny file per append, reported by the doctor, swept by
  //    compaction / fresh rewrites (which reset the generation count,
  //    so stale claims MUST not survive them).
  //
  // A writer tag names ONE logical writer; concurrency WITHIN a tag is
  // the caller's serialization responsibility (the reference is a
  // single-process mutable store — vicinity.py:236-283 — so one tag ==
  // one reference-equivalent owner).
  // ------------------------------------------------------------------

  /** default claim identity: stable for this JVM's lifetime (pid@host),
    * so a same-process replay reclaims its own slot while a different
    * process's claim is a detected conflict */
  lazy val defaultWriterTag: String =
    "writer-" +
      java.lang.management.ManagementFactory.getRuntimeMXBean.getName

  private def claimsDir(path: String): String =
    path.stripSuffix("/") + "/_claims"

  /** `slot` namespaces independent generation counters of one layout:
    * "gen" = append generations (every family), "tomb" = tombstone
    * generations (the graph families' deletes — two concurrent deleters
    * race the tombstone slot exactly as appenders race `_gen=N`). */
  private def claimFile(path: String, gen: Int, slot: String): Path =
    new Path(claimsDir(path), s"$slot-$gen")

  /** Atomically claim generation `gen` of the layout at `path` for
    * `tag`. Returns None on success (fresh claim or own-tag reclaim),
    * Some(holderTag) when a different writer holds the slot. */
  private def tryClaim(spark: SparkSession, path: String, gen: Int,
      tag: String, slot: String): Option[String] = {
    val f = claimFile(path, gen, slot)
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(f.getParent)
    try {
      val out = fs.create(f, false) // create-exclusive: the atomic claim
      try out.write(tag.getBytes("UTF-8")) finally out.close()
      None
    } catch {
      case e: java.io.IOException =>
        if (!fs.exists(f)) throw e // a real IO failure, not a lost race
        val holder =
          try {
            val in = fs.open(f)
            try new String(
              org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
            finally in.close()
          } catch { case _: java.io.IOException => "<unreadable>" }
        if (holder == tag) None else Some(holder)
    }
  }

  /** Claim the next append slot: claim at the sidecar's committed count,
    * and when another writer holds that slot, re-read the sidecar —
    * advanced means the holder committed (retry at the new slot),
    * unchanged means in-flight-or-crashed (fail loudly, both tags
    * named). Returns the claimed generation number; the caller writes
    * `_gen=<returned>` and commits the sidecar at `<returned>+1`.
    * On a failure AFTER the claim and BEFORE the sidecar commit the
    * caller should [[releaseClaim]] so other writers are not blocked —
    * any partial `_gen=N` data is an orphan the next claimant's write
    * clears ([[graft.index.VectorBuckets.writeGeneration]]). */
  def claimAppendGeneration(spark: SparkSession, path: String,
      tag: String, readGens: () => Int, maxAttempts: Int = 8,
      slot: String = "gen"): Int = {
    var gens = readGens()
    var attempts = 0
    while (attempts < maxAttempts) {
      tryClaim(spark, path, gens, tag, slot) match {
        case None => return gens
        case Some(holder) =>
          val cur = readGens()
          if (cur == gens)
            throw new IllegalStateException(
              s"$slot generation $gens of $path is claimed by writer " +
                s"'$holder' (this writer: '$tag') and the sidecar has " +
                "not advanced — the holder is in-flight or crashed. " +
                "Retry after its commit, replay the crashed append " +
                "under its own tag, or break the claim " +
                "(graft.core.Generations.breakClaim) after confirming " +
                "the holder is dead; compactServing also resets claims.")
          gens = cur // holder committed: contend for the fresh slot
          attempts += 1
      }
    }
    throw new IllegalStateException(
      s"could not claim an append generation of $path after " +
        s"$maxAttempts attempts — the layout is under persistent " +
        "concurrent append load; serialize writers or batch increments")
  }

  /** Release `tag`'s claim on `gen` — the cleanup for a FAILED append
    * (guard refusal or write error after the claim): the slot reopens,
    * and any partial `_gen=N` data is an orphan the next claimant
    * clears. Only removes the claim when `tag` actually holds it. */
  def releaseClaim(spark: SparkSession, path: String, gen: Int,
      tag: String, slot: String = "gen"): Unit = {
    val f = claimFile(path, gen, slot)
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(f)) {
      val holder =
        try {
          val in = fs.open(f)
          try new String(
            org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
          finally in.close()
        } catch { case _: java.io.IOException => return }
      if (holder == tag) fs.delete(f, false)
    }
  }

  /** Operator override: remove a claim regardless of holder — for a
    * confirmed-dead writer whose crashed claim blocks the slot. The
    * orphaned `_gen=N` data (if any) stays invisible (`_gen <`
    * committed) and is cleared by the next claimant's write. */
  def breakClaim(spark: SparkSession, path: String, gen: Int,
      slot: String = "gen"): Unit = {
    val f = claimFile(path, gen, slot)
    val fs = f.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(f)) fs.delete(f, false)
  }

  /** every (generation, holderTag) claim at `path` — the doctor's view */
  def listClaims(spark: SparkSession, path: String,
      slot: String = "gen"): Seq[(Int, String)] = {
    val d = new Path(claimsDir(path))
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(d)) return Seq.empty
    val pre = slot + "-"
    fs.listStatus(d).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith(pre) &&
        p.getName.stripPrefix(pre).nonEmpty &&
        p.getName.stripPrefix(pre).forall(_.isDigit))
      .map { p =>
        val tag =
          try {
            val in = fs.open(p)
            try new String(
              org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
            finally in.close()
          } catch { case _: java.io.IOException => "<unreadable>" }
        (p.getName.stripPrefix(pre).toInt, tag)
      }.sortBy(_._1)
  }

  /** Drop the whole claims ledger — called by every compaction / fresh
    * rewrite that RESETS the layout's generation count (a stale spent
    * claim at `gen-1` would otherwise block the first post-compact
    * append forever). The cell families' whole-root swaps drop the
    * ledger implicitly; the sub-layout-swapping families call this. */
  def clearClaims(spark: SparkSession, path: String): Unit = {
    val d = new Path(claimsDir(path))
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(d)) fs.delete(d, true)
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
