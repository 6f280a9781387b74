package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The disk-resident serving contract (verdict r11 #8): every index
  * family that answers TOP-K straight off its partitioned parquet layout
  * implements ONE interface, so a serving tier routes on capability
  * flags instead of per-family reflection. Members: [[IvfStrategy]]
  * (flat cells), [[IvfSq8Strategy]] (scalar-coded cells),
  * [[IvfPqStrategy]] (PQ-coded cells, rerank included),
  * [[HnswStrategy]] (per-hop graph walk), and [[LshStrategy]]
  * (probe-pruned (table, bucket) postings + id-bucketed rerank
  * vectors), [[BqStrategy]] (id-bucketed signature+vector table for
  * top-k/threshold, plus a nested MIH chunk table behind the
  * [[supportsDiskHamming]] capability — the binary family's native
  * integer-radius shape, kept a SEPARATE entry point rather than
  * shoehorned into the metric-units threshold parameter), and
  * [[IvfBqStrategy]] (cell-partitioned signature scan).
  *
  * Writing the layout stays the family's own entry point
  * ([[IndexStrategy.writeIndex]] for the cell families,
  * [[HnswStrategy.writeGraphIndex]] for the graph) because layouts
  * differ in KIND — cells scan, graphs hop — and a serving tier writes
  * once at build time but queries forever; the uniform surface is the
  * query/maintenance side.
  *
  * Capability flags default to false; a family that implements an
  * optional operation overrides the flag AND the method together, so
  * `supportsX` is always an honest router predicate.
  */
trait DiskServing { self: IndexStrategy =>

  // Writer identity is an explicit `tag` parameter on every mutating
  // entry point, NOT instance state (advice r17: a tag passed once to
  // the facade stuck to the shared strategy instance for every later
  // append, and concurrent callers on one instance cross-contaminated
  // tags). The default is the per-JVM tag (pid@host) — a same-process
  // replay of a crashed append reclaims its own slot while another
  // process's claim of the same slot is a detected conflict. A
  // deployment with deterministic replay (a streaming job re-running a
  // micro-batch in a NEW process) passes its own stable identity, e.g.
  // `stream-<batchId>`. One tag names ONE logical writer; calls under
  // the same tag must be serialized by the caller.

  /** Write the family's serving layout — the cell families' partitioned
    * [[IndexStrategy.writeIndex]] by default; the graph family overrides
    * to its bucketed graph layout. The one write a serving tier performs
    * at build time; everything else on this trait reads it. */
  def writeServingIndex(prepared: DataFrame, path: String): Unit =
    self.writeIndex(prepared, path)

  /** Top-k served from the layout at `path` — identical results to
    * [[IndexStrategy.query]] on the in-memory prepared frame
    * (spec-pinned per family). */
  def queryFromDisk(spark: SparkSession, path: String, queries: DataFrame,
      k: Int): DataFrame

  /** Pre-filter metadata search off the layout (k results survive
    * arbitrarily selective predicates; the metadata column rides IN the
    * layout so the predicate reaches the scan). */
  def supportsDiskFiltered: Boolean = false
  def queryFilteredFromDisk(spark: SparkSession, path: String,
      queries: DataFrame, k: Int, predicate: Column): DataFrame =
    throw new UnsupportedOperationException(
      s"$name does not serve filtered queries from disk")

  /** Radius search off the same layout (the families whose kernel has a
    * distance-threshold form). */
  def supportsDiskThreshold: Boolean = false
  def queryThresholdFromDisk(spark: SparkSession, path: String,
      queries: DataFrame, threshold: Double, maxK: Int): DataFrame =
    throw new UnsupportedOperationException(
      s"$name does not serve threshold queries from disk")

  /** Exact Hamming-radius search off the layout — the BINARY family's
    * native range-search shape (FAISS `IndexBinaryFlat.range_search`
    * takes an integer bit radius; `faiss.py:93-100` is the scalar end of
    * the same quantizer spectrum). Inclusive `<= bits`, (dist, id)-ranked,
    * capped at `maxK` — deliberately a separate entry point from
    * [[queryThresholdFromDisk]], whose threshold is in the exact metric's
    * units: overloading one parameter with two unit systems would be the
    * silent-divergence trap the facade's max_k audit (r13) closed. */
  def supportsDiskHamming: Boolean = false
  def queryHammingFromDisk(spark: SparkSession, path: String,
      queries: DataFrame, bits: Int, maxK: Int): DataFrame =
    throw new UnsupportedOperationException(
      s"$name does not serve Hamming-radius queries from disk")

  /** Delete against the layout — partition-scoped rewrite (cell
    * families) or tombstone generations (graph family); returns rows
    * removed/newly tombstoned. `rows` must carry `id`; families that
    * compute the touched partition FROM the vector (IVF) require
    * `vector` too — see each implementation's scaladoc. */
  def supportsDiskDelete: Boolean = false
  def deleteFromDisk(spark: SparkSession, path: String, rows: DataFrame,
      tag: String = graft.core.Generations.defaultWriterTag): Long =
    throw new UnsupportedOperationException(
      s"$name does not delete from disk")

  /** Append an increment to the layout as a committed generation AND
    * return the grown PREPARED frame (prevPrepared ∪ the prepared
    * increment) — the one capability behind the facade's
    * `insertIntoServing`, so the facade routes on a flag instead of
    * per-family instanceof (review r14; the trait's founding rule).
    * Every layout family implements it as of r16 — the graph/bucket
    * families since r14/r15, the cell families through the shared
    * generation machinery ([[IvfStrategy.appendPreparedCells]]); only
    * layoutless BASIC keeps the flag false. */
  def supportsDiskAppend: Boolean = false
  def appendToServing(spark: SparkSession, path: String,
      prevPrepared: DataFrame, newRows: DataFrame,
      tag: String = graft.core.Generations.defaultWriterTag): DataFrame =
    throw new UnsupportedOperationException(
      s"$name has no appendable serving layout")

  /** Fold the layout's committed append generations — and, for the
    * tombstone families, spent tombstones — back to a single `_gen=0`
    * state (verdict r14 #3: the append story went through this trait,
    * so the fold-generations-back story does too, or a deployment must
    * special-case per family exactly where the trait promised it
    * wouldn't). Pure I/O optimization: served results are identical
    * before and after (spec-pinned per family), appends continue on the
    * compacted layout. Implemented by every layout family as of r16
    * (the cell families fold through
    * [[IvfStrategy.compactCells]]). */
  def supportsCompaction: Boolean = false
  final def compactServing(spark: SparkSession, path: String,
      tag: String = graft.core.Generations.defaultWriterTag): Unit = {
    if (!supportsCompaction)
      throw new UnsupportedOperationException(
        s"$name has no compactable serving layout")
    maintained(spark, path, tag)(doCompactServing(spark, path))
  }

  /** the family's compaction body, run under the maintenance fence */
  protected def doCompactServing(spark: SparkSession, path: String): Unit =
    throw new UnsupportedOperationException(
      s"$name has no compactable serving layout")

  /** Maintenance fence (verdict r17 #2): compaction and rebuild sweep
    * the claims ledger and swap directories under the assumption that
    * no writer is in flight — this makes the assumption CHECKED rather
    * than hoped. The fence takes the layout's single `maint` marker
    * (refusing while any unresolved writer claim exists) and every
    * writer's claim checks the marker after winning its slot
    * ([[graft.core.Generations.claimAppendGeneration]]), so a
    * maintenance-vs-writer race fails loudly on whichever side arrives
    * second. Success path: the maintenance body's own ledger sweep
    * removes the marker; failure path: the finally releases it, so a
    * thrown (not crashed) maintenance never wedges writers. A CRASHED
    * maintenance leaves the marker blocking writers loudly — the safe
    * direction; the re-run reclaims it under the same tag. */
  protected final def maintained[A](spark: SparkSession, path: String,
      tag: String)(body: => A): A = {
    graft.core.Generations.beginMaintenance(spark, path, tag,
      committedCounts(spark, path))
    try body
    finally graft.core.Generations.endMaintenance(spark, path, tag)
  }

  /** Committed generation count per claim slot, read leniently from the
    * family's sidecar (absent layout/sidecar → 0, making EVERY claim
    * count as unresolved — the safe direction). The maintenance fence's
    * spent-vs-unresolved predicate; families with a second counter (the
    * graph families' tombstones) add their `tomb` slot. */
  def committedCounts(spark: SparkSession, path: String): Map[String, Int]

  /** Retrain the layout's LEARNED state (codebooks, ranges, rotation,
    * graph) on its CURRENT live rows and atomically swap the retrained
    * layout in — the actuator the staleness monitors point at
    * (`q_index_staleness` / `q_ivf_cell_skew` report drift; appends
    * deliberately never retrain, FAISS add-after-train parity, so
    * without this every "your codebook is stale" reading is advice a
    * deployment cannot act on through the serving surface). Returns the
    * freshly-trained strategy with the rows it trained on and its
    * prepared frame; the CALLING instance's trained state no longer
    * matches the new sidecar, so its next serving call is rejected by
    * the codebook guard — by design: exactly one instance serves a
    * layout's current state.
    *
    * True only for the families with data-learned state. LSH and BQ
    * stay false honestly: their hash state (planes seed, sign
    * signatures) is data-independent, nothing ever goes stale, and
    * [[compactServing]] is already their complete maintenance story. */
  def supportsRebuild: Boolean = false
  final def rebuildServing(spark: SparkSession, path: String,
      tag: String = graft.core.Generations.defaultWriterTag): DiskServing.Rebuilt = {
    if (!supportsRebuild)
      throw new UnsupportedOperationException(
        s"$name has no retrainable serving state — its layout never goes " +
          "stale under appends/deletes (hash planes/signatures are " +
          "seed-deterministic); compactServing is its maintenance operation")
    maintained(spark, path, tag)(doRebuildServing(spark, path))
  }

  /** the family's rebuild body, run under the maintenance fence */
  protected def doRebuildServing(spark: SparkSession,
      path: String): DiskServing.Rebuilt =
    throw new UnsupportedOperationException(
      s"$name has no retrainable serving state")

  /** Layout doctor ([[ServingFsck]]): verify the layout's crash-window
    * invariants against the actual directory tree and report one row
    * per check — (component, check, status ok|warn|fail, observed).
    * Diagnosis only: never repairs (the mutation paths sweep their own
    * leftovers), never throws on a recognized layout (a monitoring tier
    * wants rows, not exceptions — a missing sidecar is a `fail` row). */
  def fsckServing(spark: SparkSession, path: String): DataFrame
}

object DiskServing {
  /** result of [[DiskServing.rebuildServing]]: the freshly-trained
    * strategy that now owns the layout, the live store rows the retrain
    * ran on, and the retrained prepared frame (what the swapped-in
    * layout holds) */
  final case class Rebuilt(strategy: IndexStrategy with DiskServing,
      store: DataFrame, prepared: DataFrame)

  /** Serialize a partition-rewrite DELETE against other deleters and
    * the maintenance fence (review r18): the partition-rewrite families
    * (cells, codes, LSH, BQ) delete by rewriting survivor partitions in
    * place — no generation counter, so the claim protocol's slot
    * numbering doesn't apply, but two concurrent deleters racing the
    * SAME partitions would clobber each other's survivor rewrites, and
    * a delete racing a compaction's fold-and-swap would be silently
    * dropped or write into the retired directory. The delete takes the
    * layout's single `del-0` slot as a LEASE for its duration — the
    * claim path's maintenance-marker check makes delete-vs-maintenance
    * fail loudly in both orders (the fence counts `del` claims as
    * always-unresolved via committedCounts' `"del" -> 0`) — and always
    * releases it on exit: a del claim never spends. */
  def withDeleteLease[A](spark: SparkSession, path: String, tag: String)(
      body: => A): A = {
    graft.core.Generations.claimAppendGeneration(spark, path, tag,
      () => 0, slot = "del")
    try body
    finally graft.core.Generations.releaseClaim(spark, path, 0, tag,
      slot = "del")
  }
}

/** Shared physical discipline for the id-bucketed RERANK-VECTORS
  * sub-layouts ([[LshStrategy]]'s `vectors/`, [[BqStrategy]]'s
  * `vectors/`): rows partitioned by `_nb = pmod(xxhash64(id), fan)` and
  * id-sorted within files; candidate fetches join on (_nb, id) so
  * dynamic partition pruning skips buckets no candidate touches and
  * row-group stats skip within surviving files. ONE implementation of
  * the bucket key and the scoring join (review r14: the two families
  * had near-verbatim copies — the drift class the GraphLayout refactor
  * eliminated for the graph twins). */
private[graft] object VectorBuckets {
  import org.apache.spark.sql.functions._

  /** The bucket key — write side and join side MUST share it. The id is
    * cast to long INSIDE the key (advice r14): xxhash64 hashes
    * IntegerType and LongType inputs differently, so a layout written
    * from an int-id frame would otherwise be silently unfindable by the
    * long-typed delete/append/rerank sides — casting here makes every
    * side type-insensitive by construction (no-op for long ids, which is
    * what every existing layout holds). */
  def nb(fan: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("id").cast("long")), lit(fan))

  /** a fresh (non-generation) bucketed write — kept for standalone
    * layouts; the serving layouts write generations below */
  def writeBucketed(rows: DataFrame, path: String, fan: Int): Unit =
    rows.withColumn("_nb", nb(fan))
      .repartition(col("_nb"))
      .sortWithinPartitions("id")
      .write.mode("overwrite").partitionBy("_nb")
      .parquet(path)

  /** One `_gen=N` generation of a pre-keyed sub-layout (the LSH/BQ
    * append shape: `partCol` already computed by the caller — postings
    * `_pk`, vector buckets `_nb`, MIH `_pk`): dynamic partition
    * overwrite, so a REPLAYED append (crash after the data write,
    * before the sidecar commit) overwrites its own generation instead
    * of double-appending; rows are sorted by `sortCol` within files so
    * the layout's row-group-skipping discipline survives appends. ONE
    * implementation for both families (the GraphLayout lesson: shared
    * builders over kept-in-sync copies).
    *
    * For `gen > 0` the target generation directory is CLEARED first
    * (r16 second review pass): every caller writes at gen = the
    * sidecar's committed count, so `_gen=gen` can never hold committed
    * rows — anything already there is a crashed DIFFERENT-batch append's
    * orphan, and dynamic partition overwrite alone would keep its
    * untouched partitions, which the sidecar bump after this write
    * would then resurrect as committed rows (the same class as the
    * HNSW spent-tombstone leftover, `HnswStrategy.deleteFromDisk`).
    * Same-batch replays are unaffected: delete-then-rewrite of
    * identical content. Orphans are invisible to readers (`_gen <`
    * committed), so the clear races with no scan. */
  def writeGeneration(rows: DataFrame, partCol: String, sortCol: String,
      sub: String, gen: Int): Unit = {
    if (gen > 0) clearOrphanGeneration(rows.sparkSession, sub, gen)
    rows.withColumn("_gen", lit(gen))
      .repartition(col(partCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_gen", partCol).parquet(sub)
  }

  /** delete an UNCOMMITTED generation's directory if present — callers
    * guarantee `gen` ≥ the sidecar's committed count, so the directory
    * can only be a crashed append's leftover */
  def clearOrphanGeneration(spark: SparkSession, sub: String,
      gen: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$sub/_gen=$gen")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Fresh (re)write of a generation sub-layout: plain `_gen=0` on a
    * virgin path; staging + rename swap when the path exists (the
    * [[GraphLayout.writeFresh]] argument: dynamic partition overwrite
    * alone keeps stale partitions a rewrite doesn't touch, and a
    * pre-delete would yank live files from under an input plan reading
    * the same layout — which is exactly what compaction does).
    * `withSidecar` runs against the directory the data was just written
    * into — the live dir on a virgin write, the STAGING dir before the
    * swap on a rewrite — for sub-layouts whose sidecar lives INSIDE them
    * (the BQ `mih/_mih_meta.json` case, advice r15): writing the sidecar
    * into staging means the promoted directory is born complete, so no
    * crash window ever leaves the layout without its config (a re-run of
    * a compact that crashed in such a window could not even start — its
    * own reader fails on the missing sidecar). */
  def writeFreshGeneration(rows: DataFrame, partCol: String,
      sortCol: String, sub: String,
      withSidecar: String => Unit = _ => ()): Unit = {
    val spark = rows.sparkSession
    val live = new org.apache.hadoop.fs.Path(sub)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live)) {
      writeGeneration(rows, partCol, sortCol, sub, 0)
      withSidecar(sub)
    } else {
      val staging = sub + "__staging"
      val st = new org.apache.hadoop.fs.Path(staging)
      if (fs.exists(st)) fs.delete(st, true)
      writeGeneration(rows, partCol, sortCol, staging, 0)
      withSidecar(staging)
      graft.core.Generations.swapInto(spark, sub, staging)
    }
  }

  /** exact metric scores of (query_id, id) candidates against an
    * id-bucketed vectors frame through the DPP-keyed (_nb, id) join —
    * `queries` must already be in the caller's prepared form (normalized
    * for the families that normalize); `fan` is the SIDECAR's recorded
    * value, never an instance constant. */
  def rerank(vecs: DataFrame, queries: DataFrame, cands: DataFrame,
      fan: Int, metric: graft.core.Metric): DataFrame = {
    val d = graft.functions.VectorFunctions.distance(metric)(
      col("vector"), col("qvector"))
    cands
      .withColumn("_nb", nb(fan))
      .join(vecs.select(col("_nb"), col("id"), col("vector")),
        Seq("_nb", "id"))
      .join(broadcast(queries.select(col("query_id"), col("qvector"))),
        Seq("query_id"))
      .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"))
  }
}

/** Shared mechanics for the FLAT-CODES serving layouts (r16:
  * [[PqStrategy]], [[Sq8Strategy]], and [[OpqStrategy]] through PQ):
  * one id-bucketed generation sub-layout `vectors/_gen=N/_nb=…` holding
  * the full prepared rows, plus ONE sidecar file at the layout root
  * carrying the family's entire trained state — so the layout is
  * self-describing, the commit point is a single sidecar write, and the
  * maintenance ops (delete by bucket, append as a guarded generation,
  * compaction fold) are byte-identical in discipline across the
  * families (the VectorBuckets/GraphLayout lesson: shared builders over
  * kept-in-sync copies). The family-specific parts — sidecar schema and
  * the scoring kernels — stay in the strategies. */
private[graft] object CodesLayout {
  import org.apache.spark.sql.functions._

  /** fresh write: `_gen=0` data + sidecar, staged WHOLE and swapped
    * when the path exists — no window where new codes sit under an old
    * sidecar's trained state */
  def writeServing(keyed: DataFrame, path: String, metaFile: String,
      metaJson: String): Unit = {
    val spark = keyed.sparkSession
    def writeInto(dir: String): Unit = {
      VectorBuckets.writeGeneration(keyed, "_nb", "id",
        s"$dir/vectors", gen = 0)
      graft.core.FsIO.write(s"$dir/$metaFile", metaJson)
    }
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live)) writeInto(path)
    else {
      val staging = path + "__staging"
      val st = new org.apache.hadoop.fs.Path(staging)
      if (fs.exists(st)) fs.delete(st, true)
      writeInto(staging)
      graft.core.Generations.swapInto(spark, path, staging)
    }
  }

  /** committed generations of the vectors sub-layout — swap-tolerant
    * (the sub-layout is a compact-and-swap target; readers are
    * lock-free by design, see [[graft.core.Generations.readSwapSafe]]) */
  def committed(spark: SparkSession, path: String, gens: Int): DataFrame =
    graft.core.Generations.readSwapSafe(spark, s"$path/vectors")
      .where(col("_gen") < gens)

  /** delete by id: touched `_nb` buckets computed from the ids, the
    * (generation, bucket) pairs that actually hold them probed with one
    * bucket-pruned, id-semi-joined read — I/O proportional to the
    * batch. Returns rows removed. */
  def deleteIds(spark: SparkSession, path: String, fan: Int, gens: Int,
      rows: DataFrame): Long = {
    val keyed = rows.select(col("id").cast("long").as("id")).distinct()
      .withColumn("_nb", VectorBuckets.nb(fan)).cache()
    try {
      val nbs = keyed.select("_nb").distinct().collect().map(_.getLong(0))
        .map(java.lang.Long.valueOf).toSeq
      if (nbs.isEmpty) return 0L
      val present = committed(spark, path, gens)
        .where(col("_nb").isin(nbs: _*))
        .join(keyed.select("id"), Seq("id"), "left_semi")
        .select(col("_gen").cast("int"), col("_nb").cast("long"))
        .distinct().collect()
      if (present.isEmpty) return 0L
      val grouped = present.groupBy(_.getInt(0)).map { case (g, rs) =>
        g -> rs.map(r => java.lang.Long.valueOf(r.getLong(1)): Any).toSeq
      }
      val (before, after) = PartitionRewrite.dropIdsByGen(spark,
        s"$path/vectors", "_nb", grouped, keyed.select("id"),
        sortCol = Some("id"))
      before - after
    } finally keyed.unpersist()
  }

  /** append an increment (already `_nb`-keyed) as a CLAIMED `_gen=N`
    * (verdict r16 #1 — `readGens` re-reads the family sidecar so a
    * contended slot retries at the committed count; `tag` names the
    * logical writer): batch self-duplicate and cross-layout
    * id-freshness guards through the bucket-pruned read, dynamic
    * partition overwrite so a same-tag replay overwrites its own
    * generation, then the caller-provided sidecar commit (`commitMeta`
    * receives the CLAIMED generation count + 1 — the commit point). A
    * failure after the claim and before the commit releases the slot. */
  def appendGeneration(spark: SparkSession, path: String, tag: String,
      readGens: () => Int, keyed: DataFrame,
      commitMeta: Int => Unit): Unit = {
    val selfDup = keyed.groupBy("id").agg(count(lit(1)).as("_c"))
      .where(col("_c") > 1).limit(1).collect()
    require(selfDup.isEmpty,
      s"append batch contains duplicate ids (e.g. id " +
        s"${selfDup.headOption.map(_.getLong(0)).getOrElse(-1L)})")
    val gens = graft.core.Generations.claimAppendGeneration(spark, path,
      tag, readGens)
    try {
      val nbs = keyed.select("_nb").distinct().collect().map(_.getLong(0))
        .map(java.lang.Long.valueOf).toSeq
      val clash = committed(spark, path, gens)
        .where(col("_nb").isin(nbs: _*))
        .select("id")
        .join(keyed.select("id"), Seq("id"), "left_semi")
        .limit(1).collect()
      require(clash.isEmpty,
        s"append contains ids already present in the layout at $path " +
          s"(e.g. id ${clash.headOption.map(_.getLong(0)).getOrElse(-1L)})")
      VectorBuckets.writeGeneration(keyed, "_nb", "id",
        s"$path/vectors", gen = gens)
      commitMeta(gens + 1)
    } catch {
      case e: Throwable =>
        graft.core.Generations.releaseClaim(spark, path, gens, tag)
        throw e
    }
  }

  /** fold committed generations back to `_gen=0` (staged + swapped),
    * then the caller's sidecar rewrite resets the count — a crash
    * between the two leaves a count HIGHER than the generations
    * present, which every reader's `_gen <` filter tolerates, and a
    * re-run heals */
  def compact(spark: SparkSession, path: String, gens: Int,
      commitMeta: () => Unit): Unit = {
    VectorBuckets.writeFreshGeneration(
      committed(spark, path, gens).drop("_gen"),
      "_nb", "id", s"$path/vectors")
    commitMeta()
    // the count reset: spent claims must not outlive it, or the first
    // post-compact append's slot would read as foreign-claimed forever
    graft.core.Generations.clearClaims(spark, path)
  }
}

/** Partition-scoped delete-rewrite over a partitioned layout — the
  * [[IvfStrategy.deleteFromDisk]] idiom factored for reuse: survivors of
  * ONLY the named partition directories land in a temp layout and swap
  * in per directory (never an in-place overwrite of a path being read);
  * a partition emptied by the delete is removed outright — the edge
  * dynamic partition overwrite silently skips. */
private[graft] object PartitionRewrite {
  import org.apache.spark.sql.functions._

  /** Drop rows whose `id` appears in `deleteIds` from the partitions of
    * `path` whose `partCol` value is in `partVals`; everything else is
    * untouched (byte-identical files). `sortCol`, when given, restores
    * the layout's within-file sort discipline on the rewritten
    * partitions (review r14 — the serving reads' row-group skipping
    * depends on it). Each partition swaps in via rename-aside with
    * rollback (the [[graft.core.Generations.swapInto]] protocol, per
    * directory): a failed rename rolls the live directory back and
    * throws instead of silently losing survivors. Both the temp layout
    * and the retired directory use dot-prefixed names (advice r14): a
    * name like `_pk=5__old` contains '=', so Spark's partition discovery
    * would read a crash's leftover as a bogus partition VALUE (and flip
    * the column's inferred type to string); dot-prefixed paths are
    * hidden from discovery, so every crash window leaves only invisible
    * leftovers — swept on the next delete of the same path. Returns
    * (rows before, rows after) over the affected partitions. */
  def dropIds(spark: SparkSession, path: String, partCol: String,
      partVals: Seq[Any], deleteIds: DataFrame,
      sortCol: Option[String] = None): (Long, Long) = {
    if (partVals.isEmpty) return (0L, 0L)
    val affected = spark.read.parquet(path)
      .where(col(partCol).isin(partVals: _*)).cache()
    val before = affected.count()
    val survivors0 = affected
      .join(deleteIds.select("id"), Seq("id"), "left_anti")
    val survivors = sortCol.fold(survivors0)(s =>
      survivors0.repartition(col(partCol))
        .sortWithinPartitions(col(partCol), col(s))).cache()
    val after = survivors.count()
    val livePath = new org.apache.hadoop.fs.Path(path)
    val fs = livePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // hidden temp: a dot-prefixed SIBLING (never inside the live dir),
    // with '=' scrubbed from the name so no listing can partition-parse it
    val tmpPath = new org.apache.hadoop.fs.Path(livePath.getParent,
      "." + livePath.getName.replace("=", "_") + ".delete.tmp")
    // clear leftovers from a crashed earlier delete FIRST — the temp's
    // stale partitions must not be promoted (the r12/r13 staging lesson),
    // and spent hidden retired dirs are dead weight
    if (fs.exists(tmpPath)) fs.delete(tmpPath, true)
    if (fs.exists(livePath))
      fs.listStatus(livePath).map(_.getPath)
        .filter(_.getName.startsWith(".old_"))
        .foreach(p => fs.delete(p, true))
    survivors.write.mode("overwrite").partitionBy(partCol)
      .parquet(tmpPath.toString)
    partVals.foreach { v =>
      val dst = new org.apache.hadoop.fs.Path(s"$path/$partCol=$v")
      val src = new org.apache.hadoop.fs.Path(s"$tmpPath/$partCol=$v")
      val old = new org.apache.hadoop.fs.Path(livePath,
        s".old_$partCol=$v")
      if (fs.exists(old)) fs.delete(old, true)
      if (fs.exists(dst) && !fs.rename(dst, old))
        throw new java.io.IOException(s"delete: cannot retire $dst")
      if (fs.exists(src) && !fs.rename(src, dst)) {
        fs.rename(old, dst) // roll back the live dir before failing
        throw new java.io.IOException(s"delete: cannot promote $src")
      }
      fs.delete(old, true)
    }
    fs.delete(tmpPath, true)
    affected.unpersist(); survivors.unpersist()
    (before, after)
  }

  /** [[dropIds]] over a GENERATION-NESTED layout (`_gen=N/` above the fan
    * key — the LSH/BQ append shape): each generation's subdir is its own
    * partitioned layout, so the rewrite recurses per generation with the
    * same rename-aside discipline, touching only the (generation,
    * partition) pairs the delete batch maps to. `genToVals` comes from
    * the caller's pruned read of the layout itself (an id's rows live in
    * exactly one generation — appends refuse duplicate ids), so I/O
    * stays proportional to the batch. Returns summed (before, after). */
  def dropIdsByGen(spark: SparkSession, path: String, partCol: String,
      genToVals: Map[Int, Seq[Any]], deleteIds: DataFrame,
      sortCol: Option[String] = None): (Long, Long) =
    genToVals.toSeq.sortBy(_._1).foldLeft((0L, 0L)) {
      case ((b, a), (gen, vals)) =>
        val (db, da) = dropIds(spark, s"$path/_gen=$gen", partCol, vals,
          deleteIds, sortCol)
        (b + db, a + da)
    }
}

/** Shared physical helpers for the GRAPH-shaped serving layouts
  * ([[HnswStrategy]]'s layered graph, [[NnDescentStrategy]]'s
  * single-layer k-NN graph): node-bucketed, id-sorted, generation-tagged
  * parquet subdirs, and the partition-pruned, filter-pushed point read
  * every walk hop goes through — ONE implementation so the two families'
  * layouts stay byte-compatible in discipline (r13 lesson: shared
  * builders over kept-in-sync copies). */
private[graft] object GraphLayout {
  import org.apache.spark.sql.functions._

  /** The tombstone counter's OWN sidecar, split from the graph meta
    * (advice r17): an append's commit rewrites the graph meta
    * (generations + recomputed entries) and a delete's commit rewrites
    * ONLY this file, so concurrent cross-kind writers never
    * read-modify-write each other's counter — the previous shared-file
    * commit let an append (serialized only against other appends)
    * silently revert a delete's tombstone count committed in between,
    * resurrecting the deleted rows, and symmetrically let a delete
    * revert an append's generation count, hiding its rows. Absent file
    * = no tombstones, so pre-delete layouts and fresh rewrites read as
    * tombstone-free without a write. */
  def tombstoneGens(path: String): Int = {
    // the split sidecar is authoritative when present (even at 0); a
    // layout written BEFORE the split (review r18) carries the counter
    // inside its graph meta — read it there rather than silently
    // resurrecting its committed tombstones as "count 0"
    if (graft.core.FsIO.exists(s"$path/_tomb_meta.json"))
      graft.core.Generations.sidecarCount(s"$path/_tomb_meta.json",
        "tombstone_generations")
    else math.max(
      graft.core.Generations.sidecarCount(s"$path/_graph_meta.json",
        "tombstone_generations"),
      graft.core.Generations.sidecarCount(s"$path/_nn_serving_meta.json",
        "tombstone_generations"))
  }

  def writeTombstoneGens(path: String, tGens: Int): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("tombstone_generations", tGens)
    graft.core.FsIO.write(s"$path/_tomb_meta.json",
      mapper.writeValueAsString(root))
  }

  /** committed tombstone set as an `(id)` frame — None when the layout
    * has none. Tombstones live as their own `_gen` generations under
    * `tombstones/`, bucketed like everything else so a membership check
    * against a bounded candidate set prunes directories; the sidecar
    * count gates uncommitted generations exactly as for data. ONE
    * implementation for both graph families (the module's founding
    * rule), reading the split counter above. */
  def tombstoneFrame(spark: SparkSession,
      path: String): Option[DataFrame] = {
    val tGens = tombstoneGens(path)
    if (tGens <= 0) None
    else Some(graft.core.Generations.readSwapSafe(spark,
        s"$path/tombstones")
      .where(col("_gen") < tGens).select("id").distinct())
  }

  /** one `_gen=N` generation of a bucketed subdir — id-sorted within
    * each bucket (row-group min/max stats on the node id become tight
    * ranges for the pushed `IN` lists), DYNAMIC partition overwrite so a
    * replayed append REPLACES its own generation (the sketch-snapshot
    * replay discipline). */
  def writeGeneration(rows: DataFrame, idCol: String, sub: String,
      buckets: Int, gen: Int): Unit = {
    // gen > 0: clear a crashed different-batch append's orphan first —
    // the [[VectorBuckets.writeGeneration]] argument (the sidecar bump
    // after this write would resurrect the orphan's untouched partitions)
    if (gen > 0) VectorBuckets.clearOrphanGeneration(
      rows.sparkSession, sub, gen)
    rows.withColumn("_gen", lit(gen))
      .withColumn("_nb", pmod(col(idCol), lit(buckets)).cast("int"))
      .repartition(col("_nb")).sortWithinPartitions("_nb", idCol)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_gen", "_nb").parquet(sub)
  }

  /** Fresh (re)write of a bucketed subdir: a plain generation-0 write on
    * a virgin path; a staging write + rename swap when the path exists
    * (review r14) — dynamic partition overwrite alone would keep stale
    * partitions the rewrite doesn't touch (served forever after), and a
    * pre-delete would yank live files out from under an input plan
    * reading the same layout (rewrite-from-own-read is the compaction
    * idiom). */
  def writeFresh(rows: DataFrame, idCol: String, sub: String,
      buckets: Int): Unit = {
    val spark = rows.sparkSession
    val live = new org.apache.hadoop.fs.Path(sub)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live)) writeGeneration(rows, idCol, sub, buckets, gen = 0)
    else {
      val staging = sub + "__staging"
      val st = new org.apache.hadoop.fs.Path(staging)
      if (fs.exists(st)) fs.delete(st, true)
      writeGeneration(rows, idCol, staging, buckets, gen = 0)
      graft.core.Generations.swapInto(spark, sub, staging)
    }
  }

  /** The one disk accessor every hop goes through: bucket IN-list as a
    * PARTITION filter + node-id IN-list pushed into the scan (row-group
    * skipping against the id-sorted files). Only COMMITTED generations
    * are visible (`maxGen` = the sidecar count, so an orphan generation
    * from a crashed append is ignored); for a key an append touched, the
    * LATEST generation's rows replace the earlier ones. Pre-generation
    * layouts (no `_gen` column) read unchanged. */
  /** The committed-generations base frame of one sub-layout, resolved
    * swap-safely — split out of [[prunedRead]] (r21) so an ITERATIVE
    * walk can resolve each sub once per call instead of paying a fresh
    * relation (schema-inference job + listing) per hop: the hnsw disk
    * walk measured 11 one-task `parquet at` jobs per 5-query serve, all
    * re-deriving the same layout schema. A walk holding one base per sub
    * also reads ONE consistent snapshot of the layout across its hops. */
  def swapSafeBase(spark: SparkSession, path: String, sub: String,
      maxGen: Int = Int.MaxValue): DataFrame = {
    // swap-tolerant: the sub-layout is a compaction swap target
    val base0 = graft.core.Generations.readSwapSafe(spark, s"$path/$sub")
    val hasGen = base0.columns.contains("_gen")
    if (hasGen) base0.where(col("_gen") < maxGen) else base0
  }

  def prunedRead(spark: SparkSession, path: String, sub: String,
      idCol: String, ids: Array[Long], buckets: Int, cols: Seq[String],
      maxGen: Int = Int.MaxValue): DataFrame =
    pruneIds(swapSafeBase(spark, path, sub, maxGen), idCol, ids, buckets,
      cols, maxGen)

  /** the IN-list prune of [[prunedRead]], applied to a pre-resolved
    * [[swapSafeBase]] frame */
  def pruneIds(base: DataFrame, idCol: String, ids: Array[Long],
      buckets: Int, cols: Seq[String],
      maxGen: Int = Int.MaxValue): DataFrame = {
    val hasGen = base.columns.contains("_gen")
    if (ids.isEmpty) base.where(lit(false)).select(cols.map(col): _*)
    else {
      val nbs = ids.map(i => (((i % buckets) + buckets) % buckets).toInt)
        .distinct.map(Integer.valueOf).toSeq
      val filtered = base.where(col("_nb").isin(nbs: _*) &&
        col(idCol).isin(ids.map(java.lang.Long.valueOf).toSeq: _*))
      // the latest-wins dedup join only exists when deltas exist: a
      // single-generation layout (fresh write, or post-compaction — the
      // steady serving state) reads with the single-scan plan
      val out = if (hasGen && maxGen > 1) {
        val latest = filtered.groupBy(idCol).agg(max("_gen").as("_gen"))
        filtered.join(latest, Seq(idCol, "_gen"))
      } else filtered
      out.select(cols.map(col): _*)
    }
  }
}
