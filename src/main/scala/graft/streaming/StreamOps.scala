package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.Metric
import graft.operators.Knn

/** Structured Streaming operators. The reference mutates its store in place
  * (`/root/reference/vicinity/vicinity.py:236-283`); the streaming-native
  * equivalent is an append stream of (item, vector) rows folded into the
  * index, plus windowed analytics over the events stream. Every transform
  * here works identically on a batch DataFrame and a readStream DataFrame —
  * the specs drive them through a real streaming query (memory sink).
  */
object StreamOps {

  /** Tumbling-window event rollup with a watermark — the canonical
    * aggregation shape (count + sum per window × event_type). */
  def windowedEventCounts(events: DataFrame,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts_t", watermark)
      .groupBy(window(col("ts_t"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming sessionization: `session_window` merges events closer than
    * `gap` into one growing session per user and closes it once the
    * watermark passes — the streaming equivalent of the batch q_sessionize
    * (whose lag+cumulative windows cannot stream; session state here is
    * per-open-session, not per-event, so it stays bounded at any rate). */
  def sessionizedEvents(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts_t", watermark)
      .groupBy(session_window(col("ts_t"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("sum_value"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("user_id"),
        col("n_events"), col("sum_value"))

  /** Stream-static enrichment — the dimension-join every event pipeline
    * runs before anything else: the unbounded stream equi-joined to a
    * bounded dimension table. The static side is marked broadcast, so
    * every micro-batch is a map-side hash join with NO stream-side shuffle
    * and no state: Spark replans the static side per batch, which also
    * means a refreshed dimension snapshot is picked up without restarting
    * the query. At 100 TB/day this is the only join shape that keeps up —
    * a shuffled dimension join would re-shuffle every batch. */
  def enrichWithDimension(events: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Watermarked stream-STREAM interval join — the attribution shape
    * (purchase matched to the click that preceded it within the window)
    * as a true two-stream join, not a batch as-of: both sides carry
    * watermarks and the join condition bounds purchase time to
    * [click time, click time + window], so Spark can expire click state
    * once the purchase-side watermark passes click_ts + window and
    * purchase state symmetrically — per-key state is bounded by rate ×
    * window at any corpus size (the unbounded-state join the planner
    * would otherwise refuse in append mode). Inner join: unmatched rows
    * age out silently; the batch as-of family covers outer semantics. */
  def streamStreamAttribution(clicks: DataFrame, purchases: DataFrame,
      window_ : String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"),
        col("ts_t").as("c_ts"), col("value").as("c_value"))
      .withWatermark("c_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"),
        col("ts_t").as("p_ts"), col("value").as("p_value"))
      .withWatermark("p_ts", watermark)
    c.join(p, expr(
      s"""c_user = p_user AND
          p_ts >= c_ts AND p_ts <= c_ts + interval $window_"""))
      .select(col("c_user").as("user_id"), col("c_ts"), col("p_ts"),
        col("c_value"), col("p_value"))
  }

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Stateful per-key running aggregate via mapGroupsWithState — the custom
    * state shape (SURVEY §2.4 streaming row). */
  def runningUserTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_type"), col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          val batch = rows.toSeq
          val next = UserRunning(uid, prev.n + batch.size,
            prev.total + batch.map(_.value).sum)
          state.update(next)
          next
      }
      .toDF()
  }

  case class TsEvent(ts_t: java.sql.Timestamp, event_type: String,
      value: Double, user_id: Long)
  case class EwmaState(n: Long, e: Long)
  case class EwmaOut(event_type: String, n_seen: Long, ewma: Double)

  /** Streaming EWMA per event type — the live counterpart of the batch
    * q_ewma_smooth, carrying the SAME bit-exact integer state (value
    * scaled to millionths, `e ← ⌊(10⁶·x + 3·e)/4⌋` per observation):
    * per-key state is two longs forever, the decay math can never drift
    * between a streaming and a batch replay of the same prefix, and
    * within each micro-batch the group's rows fold in (ts, user_id) order
    * so the result is a pure function of batch contents, not arrival
    * interleaving. */
  def ewmaOnStream(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("ts_t"), col("event_type"), col("value"), col("user_id"))
      .as[TsEvent]
      .groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (typ: String, rows: Iterator[TsEvent], state: GroupState[EwmaState]) =>
          val ordered = rows.toSeq.sortBy(r => (r.ts_t.getTime, r.user_id))
          var st = state.getOption.getOrElse(EwmaState(0L, 0L))
          ordered.foreach { r =>
            val x = math.round(r.value * 1e6)
            st =
              if (st.n == 0L) EwmaState(1L, x)
              else EwmaState(st.n + 1, Math.floorDiv(x + 3L * st.e, 4L))
          }
          state.update(st)
          EwmaOut(typ, st.n, st.e / 1e6)
      }
      .toDF()
  }

  /** Dedup-on-ingest: drop rows whose dedup key was already seen, with
    * state bounded by the watermark (`dropDuplicatesWithinWatermark` keeps a
    * key in state only until the watermark passes its event time — the
    * streaming analogue of exact-hash dedup, and the only formulation whose
    * state does NOT grow with the full corpus at 100 TB/day ingest; an
    * unbounded `dropDuplicates` would). Key on a content hash (e.g.
    * `md5(text)`) computed upstream. */
  def dedupWithinWatermark(rows: DataFrame, keyCol: String, tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    rows.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** The daily incremental near-dup loop at micro-batch cadence: each
    * batch of shingled documents is (1) near-dup-checked against the
    * PERSISTED signature snapshot (`Dedup.loadSignatureTable` — history is
    * never re-shingled; the banded join probes with the batch only) and
    * (2) folded into the snapshot (stamped parquet append), so the NEXT
    * batch dedups against history-plus-this-batch. The batch is signed
    * exactly ONCE — the same banded frame serves the dedup probe and the
    * snapshot append. History text is consulted only for docs that land
    * in a candidate pair, resolved through `corpus` as a semi-join prune
    * (the shingle projection is lazy, so unpruned corpus rows never
    * evaluate it). `corpus()` must return history EXCLUSIVE of the
    * in-flight batch (duplicate ids would double verify-join rows).
    * Bootstrap the snapshot with [[graft.prep.Dedup.saveSignatureTable]]
    * before starting the stream. Verified pairs go to `onPairs` per batch.
    *
    * This is the 100 TB/day ingest shape end-to-end: per batch, the only
    * work proportional to history is the signature-table read (bucket keys,
    * ~200 B/doc, band-partition-prunable) — text is scanned for the batch
    * and the candidate members, nothing else. */
  def nearDupOnIngest(docStream: DataFrame, idCol: String, shingleCol: String,
      sigPath: String, corpus: () => DataFrame,
      onPairs: DataFrame => Unit, checkpointDir: String,
      threshold: Double = 0.7, bands: Int = 24, rowsPerBand: Int = 4,
      seed: Long = 42L, maxBucket: Int = 10000) = {
    import graft.prep.Dedup
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val tag = s"stream-$batchId"
        val newShingled = batch.select(col(idCol), col(shingleCol)).cache()
        val newBanded = Dedup.signatureTable(newShingled, idCol, shingleCol,
          bands, rowsPerBand, seed).cache()
        // replay guard: a batch that crashed AFTER its signature write but
        // BEFORE its checkpoint commit replays with its own generation
        // already in the snapshot — excluding it keeps the replayed run's
        // bucket sizes (and thus its emitted pair set) identical to the
        // original run's
        val histSigs = Dedup.loadSignatureTable(s, sigPath, bands,
          rowsPerBand, seed, excludeGeneration = Some(tag))
        onPairs(Dedup.incrementalPersistedCore(newShingled, newBanded,
          corpus(), histSigs, idCol, shingleCol, threshold, maxBucket))
        // maintenance: fold the batch into its OWN `_batch = stream-<id>`
        // generation via the shared dynamic-overwrite writer — checkpoint
        // recovery replays a micro-batch under the SAME id, so the replay
        // REPLACES the generation instead of double-appending signatures
        // (exactly-once snapshot maintenance on at-least-once replay)
        Dedup.writeBandedSignatures(newBanded, sigPath, tag, bands,
          rowsPerBand, seed)
        newShingled.unpersist()
        newBanded.unpersist()
        ()
      }
      .start()
  }

  /** Streaming index maintenance: append (id, item, vector) micro-batches
    * into a growing parquet index — the streaming analogue of
    * `vicinity.insert` (Q5). Returns the started query; the index dir can
    * be read back with `spark.read.parquet` + queried with [[Knn]].
    */
  /** Streaming sketch maintenance — the ingest loop for the two running
    * aggregates ([[graft.prep.CountMin]] frequencies, [[graft.prep.HyperLogLog]]
    * distinct counts): each micro-batch's items are counted, sketched,
    * and written as generation `stream-<batchId>` of the snapshot at
    * `statePath`. Dynamic partition overwrite makes a REPLAYED batch
    * replace its own generation, which keeps count-min's non-idempotent
    * cell-sum merge exactly-once on at-least-once replay (same design as
    * the near-dup signature snapshot above). Reading the running state
    * (`CountMin.loadState`) re-aggregates across generations — bounded
    * work: each generation is ≤ depth×width rows regardless of batch
    * size. */
  def countMinOnIngest(itemStream: DataFrame, itemCol: String,
      statePath: String, checkpointDir: String, depth: Int = 4,
      width: Int = 4096) =
    itemStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val counted = batch.groupBy(itemCol)
          .agg(count(lit(1)).cast("long").as("n"))
        graft.prep.CountMin.saveGeneration(
          graft.prep.CountMin.build(counted, itemCol, "n", depth, width),
          statePath, s"stream-$batchId")
        ()
      }
      .start()

  /** [[countMinOnIngest]] for HyperLogLog registers: ≤ 64 rows per
    * generation, max-merged on read (`HyperLogLog.loadState`). */
  def hllOnIngest(itemStream: DataFrame, itemCol: String,
      statePath: String, checkpointDir: String) =
    itemStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.prep.HyperLogLog.saveGeneration(
          graft.prep.HyperLogLog.registers(batch, itemCol),
          statePath, s"stream-$batchId")
        ()
      }
      .start()

  /** [[countMinOnIngest]] for the bloom membership filter: each
    * micro-batch folds its items' bit positions into the snapshot as its
    * own generation (<= m rows). The running filter
    * ([[graft.prep.BloomFilter.loadState]]) is the distinct union —
    * the live decontamination gate grows with ingest, and because bloom
    * never false-negatives, every item of every committed batch probes
    * positive the moment its batch commits (spec-pinned). */
  def bloomOnIngest(itemStream: DataFrame, itemCol: String,
      statePath: String, checkpointDir: String, k: Int = 3,
      m: Int = 8192) =
    itemStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.prep.BloomFilter.saveGeneration(
          graft.prep.BloomFilter.build(batch, itemCol, k, m),
          statePath, s"stream-$batchId")
        ()
      }
      .start()

  /** [[bloomOnIngest]] for the bottom-k order sketch
    * ([[graft.prep.BottomK]]): each micro-batch writes ITS OWN bottom-k
    * (<= k rows) as a generation; the running sketch
    * ([[graft.prep.BottomK.loadState]]) is the bottom-k over all
    * generations. Replay-safe twice over: a replayed batch overwrites
    * only its own `_batch` partition, and the merge dedups on the key
    * hash — so the live quantile estimate is exactly-once without any
    * transactional machinery (spec-pinned). */
  def sampleOnIngest(itemStream: DataFrame, keyCol: String,
      valueCol: String, statePath: String, checkpointDir: String,
      k: Int = 200) =
    itemStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.prep.BottomK.saveGeneration(
          graft.prep.BottomK.sketch(batch, keyCol, valueCol, k),
          statePath, s"stream-$batchId")
        ()
      }
      .start()

  /** Streaming repeated-line scrub — [[graft.prep.Dedup.lineDedup]] at
    * micro-batch cadence, closing the incremental story for the REWRITE
    * member of the dedup family: each batch's segments are counted into
    * their own `_batch` generation of the running segment-df snapshot
    * (count-distinct over disjoint doc-id sets sums exactly across
    * generations), and the batch is rewritten against history-plus-itself
    * BEFORE its generation lands — streaming-prefix semantics (a segment
    * reaching minDf in batch N scrubs batch N's docs onward; earlier docs
    * are not rewritten retroactively — re-run batch mode for a full
    * re-scrub). Replay guard mirrors [[nearDupOnIngest]]: the in-flight
    * tag is excluded on load so a crashed-after-write batch replays with
    * identical counts, and the generation write REPLACES its partition.
    * Per batch, the only history-sized work is the df-snapshot read
    * (one row per distinct segment above, bounded ≪ corpus text). */
  def lineDedupOnIngest(docStream: DataFrame, idCol: String, textCol: String,
      dfPath: String, onClean: DataFrame => Unit, checkpointDir: String,
      segWords: Int = 10, minDf: Int = 3) = {
    import graft.prep.Dedup
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val tag = s"stream-$batchId"
        val gen = Dedup.segmentDf(batch, idCol, col(textCol), segWords).cache()
        // first batch (no generations yet) → empty history; an explicit
        // existence check, NOT a catch on AnalysisException — the catch
        // would also swallow schema/corruption errors and a mid-swap
        // compact as "first batch", silently under-scrubbing (advice r11)
        val hist =
          if (graft.core.Generations.hasGenerations(s, dfPath))
            Dedup.loadSegmentDfState(s, dfPath, excludeGeneration = Some(tag))
          else s.emptyDataFrame.select(lit("").as("_sm"), lit(0L).as("_df"))
        val combined = hist.unionByName(gen)
          .groupBy("_sm").agg(sum("_df").cast("long").as("_df"))
        onClean(Dedup.lineDedupAgainst(batch, combined, idCol, col(textCol),
          segWords, minDf))
        Dedup.saveSegmentDf(gen, dfPath, tag)
        gen.unpersist()
        ()
      }
      .start()
  }

  def appendVectorsToIndex(vectorStream: DataFrame, indexDir: String,
      checkpointDir: String) =
    vectorStream.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", indexDir)
      .option("checkpointLocation", checkpointDir)

  /** Layout doctor for the `_batch=`-generation snapshot stores this
    * module's ingest paths maintain (count-min / HLL / bloom / bottom-k
    * / segment-df / BQ-admission signatures) —
    * [[graft.index.ServingFsck.snapshotStore]]: batch-generation count
    * (the trendable compaction-pressure reading), foreign children,
    * crash leftovers incl. the `__compacting`/`.compact.tmp` siblings.
    * The MinHash signature table's sidecar-aware variant is
    * [[graft.prep.Dedup.fsckSignatureTable]]. */
  def fsckSnapshot(spark: SparkSession, path: String): DataFrame =
    graft.index.ServingFsck.snapshotStore(spark, path)

  /** Compact a streaming-append parquet index: micro-batches leave one
    * small file each, and scan cost at 100 TB is dominated by file-open
    * overhead once files outnumber rows-per-file. Rewrites the index into
    * `targetFiles` files via an atomic-ish swap (write fresh, then replace)
    * — run it between micro-batch windows or on the query-side copy.
    * Returns the row count (unchanged by construction, spec-asserted). */
  def compactIndex(spark: SparkSession, indexDir: String,
      targetFiles: Int = 1): Long = {
    require(targetFiles >= 1)
    val df = spark.read.parquet(indexDir)
    val n = df.count()
    val tmp = indexDir + ".compact.tmp"
    df.repartition(targetFiles).write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(indexDir)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
    n
  }

  /** Micro-batch kNN over a streaming query-vector source: each micro-batch
    * of query vectors runs exact top-k against the static store (broadcast
    * stream-static join) via foreachBatch — ranking windows/udafs are not
    * allowed directly on streaming frames, and per-batch execution is the
    * right plan anyway (each batch is a complete query set). */
  def streamingKnn(queryStream: DataFrame, store: DataFrame, k: Int,
      metric: Metric)(sink: (DataFrame, Long) => Unit) =
    queryStream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        sink(Knn.query(store, batch, k, metric), batchId)
    }

  /** Streaming near-duplicate ADMISSION GATE over embeddings: each arriving
    * (id, vector) row is admitted iff its sign-bit signature is more than
    * `bits` Hamming away from (a) every previously admitted row and (b) any
    * earlier row of its own batch (first-occurrence survivor, the
    * [[graft.prep.Dedup]] convention). History matching is the
    * multi-index-hashing equi-join ([[graft.index.BqStrategy.mihMatchSigs]])
    * against the persisted signature snapshot — per batch the work is
    * (batch chunk-ball probes) × (matching history chunk rows), never a
    * history crossJoin, and the snapshot holds ONE long per admitted
    * 64-dim row, so the state a 100 TB ingest accumulates is ~8 bytes per
    * survivor. Within-batch pairs use the brute packed-Hamming kernel
    * (micro-batches are small relative to history). Admitted signatures
    * land as the batch's own `stream-<id>` generation via dynamic
    * partition overwrite, and history loads exclude the in-flight tag —
    * the same exactly-once-on-replay discipline as the MinHash/sketch
    * snapshots. `onAdmitted` receives the admitted subset of each batch.
    */
  def bqAdmitOnIngest(vectorStream: DataFrame, idCol: String, vecCol: String,
      sigPath: String, checkpointDir: String, bits: Int, dim: Int,
      chunkBits: Int = 8)(onAdmitted: (DataFrame, Long) => Unit) = {
    import graft.index.BqStrategy
    import graft.functions.VectorFunctions
    val numChunks = (dim + chunkBits - 1) / chunkBits
    vectorStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val tag = s"stream-$batchId"
        val packed = batch.select(col(idCol).as("id"),
            VectorFunctions.pack_sign_bits(
              col(vecCol).cast("array<double>")).as("_sig"))
          .cache()
        val hist = BqStrategy.loadSignatures(s, sigPath,
          excludeGeneration = Some(tag))
        val dupOfHist = BqStrategy.mihMatchSigs(hist,
            packed.select(col("id").as("query_id"), col("_sig").as("_qsig")),
            bits, chunkBits, numChunks)
          .select(col("query_id").as("id")).distinct()
        // within-batch: reject a row with ANY earlier (smaller-id) row
        // within bits — batch × batch, broadcast, tiny next to history
        val withinDup = packed.as("a")
          .crossJoin(broadcast(packed.select(col("id").as("_eid"),
            col("_sig").as("_esig")).as("b")))
          .where(col("_eid") < col("id") &&
            VectorFunctions.hamming_packed(col("_sig"), col("_esig")) <= bits)
          .select("id").distinct()
        val admitted = packed
          .join(dupOfHist.unionByName(withinDup), Seq("id"), "left_anti")
          .cache()
        BqStrategy.writeSignatures(admitted, sigPath, tag)
        onAdmitted(batch.join(admitted.select(col("id").as("_adm_id")),
          batch(idCol) === col("_adm_id"), "left_semi"), batchId)
        packed.unpersist()
        admitted.unpersist()
        ()
      }
      .start()
  }
}
