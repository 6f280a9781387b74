package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.functions.{TopK, VectorFunctions}

/** IVF (inverted-file) strategy ≙ the reference's FAISS `ivf*` index family
  * (`/root/reference/vicinity/backends/faiss.py:101-118`): train a KMeans
  * codebook (MLlib — the "MLlib for batch vector index building" north
  * star), assign every store row to its nearest centroid, and at query time
  * search only the `nprobe` nearest cells.
  *
  * Scale story (SURVEY.md §4): the prepared store carries a `_centroid`
  * column; persisted indexes are partitioned by it, so the `isin(probes)`
  * filter becomes Parquet partition pruning — a query touches nprobe/nlist
  * of the data. Cosine is served as inner-product over pre-normalized
  * vectors, exactly like FAISS (`faiss.py:49-52`, `82-83`).
  *
  * Insert assigns new rows to existing centroids without retraining
  * (≙ FAISS `add` after `train`); delete is unsupported (`faiss.py:163-165`).
  */
case class IvfStrategy(metric: Metric, nlist: Int = 100, nprobe: Int = 4,
    seed: Long = 42L) extends IndexStrategy with DiskServing {
  require(metric == Metric.Cosine || metric == Metric.Euclidean,
    s"Metric '${metric.name}' is not supported by the IVF backend.")
  val name = "ivf"

  /** trained codebook, set during prepare (deterministic: fixed seed) */
  @transient private var centroids: Array[Array[Double]] = _

  /** composition hooks for strategies layering codes over IVF cells */
  private[graft] def centroidArray: Array[Array[Double]] = centroids
  private[graft] def isTrained: Boolean = centroids != null

  /** Adopt an already-trained codebook instead of retraining — the
    * build-once registry story extended to composed strategies. ONLY valid
    * for a codebook trained with identical (store, nlist, seed): training
    * is deterministic, so the adopted centroids equal what this instance
    * would have trained, bitwise — adoption changes cost, never results
    * (spec-asserted). */
  private[graft] def adoptCentroids(c: Array[Array[Double]]): Unit = {
    require(c != null && c.nonEmpty && c.length <= nlist,
      s"adopted codebook must have 1..$nlist centroids, got " +
        s"${if (c == null) "null" else c.length.toString}")
    centroids = c
  }

  private def nearestCentroidsUdf(cents: Array[Array[Double]], n: Int) =
    udf { (v: Seq[Double]) =>
      val arr = v.toArray
      val dists = cents.map { c =>
        var s = 0.0
        var i = 0
        while (i < arr.length) { val d = arr(i) - c(i); s += d * d; i += 1 }
        s
      }
      dists.zipWithIndex.sortBy(_._1).take(n).map(_._2)
    }

  /** rows used to train the codebook; assignment still covers every row
    * (FAISS trains on a sample too — training cost must not scale with the
    * store) */
  private val maxTrainRows = 100000L

  /** below this many sample ELEMENTS (rows × dim ≤ 32 MB of doubles) the
    * codebook trains with driver-side seeded Lloyd's — one collect instead
    * of ~10 distributed jobs whose scheduling overhead dwarfs the math on
    * small data. Larger samples keep the MLlib path, which distributes the
    * assignment step (a 100k × 1536-dim capped sample is real compute). */
  private val smallTrainElems = 4L << 20

  def prepare(store: DataFrame): DataFrame = {
    val normed = maybeNormalize(store, "vector")
    if (centroids == null) {
      // train the codebook (skipped when loadAux restored one)
      val n = store.count()
      // an empty train set must fail loudly (as FAISS `train` and MLlib
      // KMeans.fit do): silently training zero centroids would leave
      // isTrained == true and later inserts assigned to a null cell that
      // no probe list ever selects
      require(n > 0, "cannot train an IVF codebook on an empty store")
      graft.core.BuildCounters.trainings.incrementAndGet()
      val k = math.min(nlist, math.max(1, n.toInt))
      val dim = if (n == 0) 1 else normed.select(size(col("vector"))).head.getInt(0)
      if (n * dim <= smallTrainElems) {
        val pts = normed.orderBy("id").select("vector")
          .collect().map(_.getSeq[Double](0).toArray)
        centroids = PqCore.kmeans(pts, k, iters = 10, new scala.util.Random(seed))
      } else {
        val feat = normed.select(array_to_vector(col("vector")).as("features"))
        val trainSet =
          if (n > maxTrainRows) feat.sample(maxTrainRows.toDouble / n, seed)
          else feat
        val model = new KMeans().setK(k).setSeed(seed).setMaxIter(10)
          .setFeaturesCol("features").setPredictionCol("_centroid")
          .fit(trainSet)
        centroids = model.clusterCenters.map(_.toArray)
      }
    }
    if (store.columns.contains("_centroid")) normed // restored from index
    else normed.withColumn("_centroid",
      nearestCentroidsUdf(centroids, 1)(col("vector")).getItem(0))
  }

  /** new rows are assigned to the EXISTING codebook — FAISS `add` after
    * `train` (`faiss.py:157-161`), no retraining */
  override def prepareIncrement(prevPrepared: DataFrame, newRows: DataFrame,
      fullStore: DataFrame): DataFrame =
    if (centroids == null) prepare(fullStore)
    else prevPrepared.unionByName(prepare(newRows))

  override def saveAux(dir: String): Unit = {
    require(centroids != null, "nothing to save before prepare")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("nlist", nlist); root.put("nprobe", nprobe); root.put("seed", seed)
    val arr = root.putArray("centroids")
    centroids.foreach { c =>
      val row = arr.addArray(); c.foreach(row.add)
    }
    graft.core.FsIO.write(s"$dir/centroids.json", mapper.writeValueAsString(root))
  }

  override def loadAux(dir: String): Unit = {
    if (graft.core.FsIO.exists(s"$dir/centroids.json")) {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(graft.core.FsIO.read(s"$dir/centroids.json"))
      val arr = root.get("centroids")
      centroids = (0 until arr.size()).map { i =>
        val row = arr.get(i)
        (0 until row.size()).map(j => row.get(j).asDouble()).toArray
      }.toArray
    }
  }

  /** index laid out by cell: `isin(probes)` filters become Parquet
    * partition pruning at query time */
  override def writeIndex(prepared: DataFrame, path: String): Unit =
    prepared.write.mode("overwrite").partitionBy("_centroid").parquet(path)

  // --------------------------------------------------------------------
  // Cell-family SERVING layout as generations (r16, verdict r15 #2 —
  // the append story unified under `supportsDiskAppend`: the delete
  // path already proved the idiom of computing a batch's cells from the
  // codebook and touching only those partitions; append is the same
  // computation writing a `_gen=N` generation per touched cell). The
  // serving layout nests `_gen=N` ABOVE `_centroid=c` (the LSH/BQ
  // discipline): probe pruning still resolves at the directory level,
  // readers union committed generations only, and the sidecar
  // `_ivf_serving_meta.json` records {family, metric, nlist, seed,
  // generations, centroids} — the codebook RIDES IN THE LAYOUT, so
  // appends/deletes validate they assign with the codebook the layout
  // was built from (a mismatched codebook would route rows to cells no
  // probe list ever selects — the silent-divergence class). The
  // portability format ([[writeIndex]], used by `Vicinity.save`) stays
  // the flat cell layout; readers serve BOTH shapes (a flat layout is a
  // single implicit committed generation).
  //
  // Honest capability caveat (unchanged from the streaming path this
  // unifies with): appends NEVER retrain the codebook — FAISS `add`
  // after `train` parity — so cell balance degrades as the appended
  // distribution drifts; `q_index_staleness` / `q_ivf_cell_skew` are
  // the monitors that say when to rebuild.
  //
  // All four cell families share this machinery (the composed
  // strategies delegate with their own `family` tag — a reader
  // validates the tag so an ivfpq layout is never served by a flat
  // instance with plausible-looking results). The shared helpers are
  // family-parameterized rather than duplicated per strategy (the
  // GraphLayout/VectorBuckets lesson: shared builders over
  // kept-in-sync copies).
  // --------------------------------------------------------------------

  private def servingMetaPath(path: String) = s"$path/_ivf_serving_meta.json"

  private def cellMetaJson(family: String, generations: Int): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("family", family)
    root.put("metric", metric.name)
    root.put("nlist", nlist)
    root.put("seed", seed)
    root.put("generations", generations)
    val arr = root.putArray("centroids")
    centroids.foreach { c => val row = arr.addArray(); c.foreach(row.add) }
    mapper.writeValueAsString(root)
  }

  /** read + validate the serving sidecar: family tag, metric, and the
    * CODEBOOK must match this instance (training is deterministic, so
    * the owning instance — or one trained/loaded identically — matches
    * bitwise; anything else must fail loudly, never probe wrong cells).
    * `family` is the caller strategy's name — the composed families
    * delegate through here with their own tag. */
  private[index] def validateCellMeta(path: String,
      family: String): com.fasterxml.jackson.databind.JsonNode = {
    require(graft.core.FsIO.exists(servingMetaPath(path)),
      s"no committed cell serving layout at $path (missing " +
        "_ivf_serving_meta.json — an interrupted writeServingIndex; " +
        "re-run it)")
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.core.FsIO.read(servingMetaPath(path)))
    Seq("family", "metric", "generations", "centroids").foreach { f =>
      require(meta.get(f) != null,
        s"layout at $path has no recorded '$f' — unrecognized sidecar")
    }
    require(meta.get("family").asText() == family,
      s"layout at $path was written by family " +
        s"'${meta.get("family").asText()}'; this instance serves '$family'")
    require(meta.get("metric").asText() == metric.name,
      s"layout at $path was built for metric " +
        s"${meta.get("metric").asText()}; this instance serves ${metric.name}")
    val arr = meta.get("centroids")
    val sidecar = (0 until arr.size()).map { i =>
      val row = arr.get(i)
      (0 until row.size()).map(j => row.get(j).asDouble()).toArray
    }.toArray
    require(centroids != null,
      "prepare (or loadAux) must run before touching a generation cell " +
        "layout — the instance holds no codebook to validate against")
    require(sidecar.length == centroids.length &&
        sidecar.indices.forall(i =>
          java.util.Arrays.equals(sidecar(i), centroids(i))),
      s"layout at $path was built with a different codebook than this " +
        "instance holds — load the owning index (or retrain with " +
        "identical store/nlist/seed) before serving or mutating it")
    meta
  }

  /** committed rows of a cell serving layout — the one read every
    * serving entry point goes through. A flat [[writeIndex]] layout (no
    * `_gen` column) reads unchanged; a generation layout requires its
    * sidecar and unions committed generations only, so an orphan
    * generation from a crashed append is invisible. */
  private[index] def servingRows(spark: org.apache.spark.sql.SparkSession,
      path: String, family: String): DataFrame = {
    val raw = spark.read.parquet(path)
    if (!raw.columns.contains("_gen")) raw
    else {
      val meta = validateCellMeta(path, family)
      raw.where(col("_gen") < meta.get("generations").asInt())
    }
  }

  /** [[DiskServing.writeServingIndex]] for the cell families: `_gen=0`
    * of the generation-nested layout plus the sidecar. A rewrite of an
    * existing path stages and swaps (dynamic partition overwrite alone
    * would keep stale cells; a pre-delete would yank files from under a
    * reader), with the sidecar written INTO staging before the swap —
    * the promoted directory is born complete (the advice-r15 BQ
    * lesson, applied from birth here). */
  private[index] def writeServingCells(prepared: DataFrame, path: String,
      family: String): Unit = {
    require(centroids != null,
      "prepare must run before writeServingIndex")
    val spark = prepared.sparkSession
    val rows = prepared.withColumn("_gen", lit(0))
      .repartition(col("_centroid"))
    def writeInto(dir: String): Unit =
      rows.write.mode("overwrite").partitionBy("_gen", "_centroid")
        .parquet(dir)
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live)) {
      writeInto(path)
      graft.core.FsIO.write(servingMetaPath(path),
        cellMetaJson(family, generations = 1))
    } else {
      val staging = path + "__staging"
      val st = new org.apache.hadoop.fs.Path(staging)
      if (fs.exists(st)) fs.delete(st, true)
      writeInto(staging)
      graft.core.FsIO.write(servingMetaPath(staging),
        cellMetaJson(family, generations = 1))
      graft.core.Generations.swapInto(spark, path, staging)
    }
  }

  /** Append an already-PREPARED increment (assigned `_centroid`, plus
    * whatever codes the calling family adds) to a generation cell
    * layout: the increment's rows land as `_gen=N` of exactly the cells
    * they assign to (dynamic partition overwrite, so a replayed append
    * overwrites its own generation — at-least-once stays exactly-once)
    * and the sidecar count commits LAST. Id freshness is guarded within
    * the batch unconditionally and against the layout through a
    * CELL-PRUNED read — the layout is cell-partitioned, not id-keyed,
    * so the cross-layout guard sees exactly the cells the batch touches
    * (it catches the replay/same-vector duplicate class outright; an id
    * re-inserted with a vector assigning elsewhere is the caller's
    * contract violation, and the facade's list-extend ids never collide
    * by construction). I/O stays proportional to the batch. */
  private[index] def appendPreparedCells(
      spark: org.apache.spark.sql.SparkSession, path: String,
      family: String, inc: DataFrame, tag: String): Unit = {
    validateCellMeta(path, family)
    require(spark.read.parquet(path).columns.contains("_gen"),
      s"layout at $path predates the generation layout — rewrite it " +
        "with writeServingIndex before appending")
    val keyed = inc.withColumn("id", col("id").cast("long")).cache()
    try {
      val first = keyed.select(size(col("vector"))).limit(1).collect()
      if (first.isEmpty) return // idle micro-batch: a safe no-op
      require(first.head.getInt(0) == centroids(0).length,
        s"appended vectors have dim ${first.head.getInt(0)}; the layout " +
          s"at $path was built at dim ${centroids(0).length}")
      val selfDup = keyed.groupBy("id").agg(count(lit(1)).as("_c"))
        .where(col("_c") > 1).limit(1).collect()
      require(selfDup.isEmpty,
        s"append batch contains duplicate ids (e.g. id " +
          s"${selfDup.headOption.map(_.getLong(0)).getOrElse(-1L)})")
      // claim the append slot BEFORE reading the committed state the
      // guards depend on (verdict r16 #1): two concurrent appenders
      // would otherwise both write `_gen=N` and dynamic-overwrite each
      // other. The claimed slot may be LATER than the first sidecar
      // read if a contender committed meanwhile — every use of `gens`
      // below is the claimed value.
      val gens = graft.core.Generations.claimAppendGeneration(spark,
        path, tag,
        () => validateCellMeta(path, family).get("generations").asInt())
      try {
        val cells = keyed.select("_centroid").distinct().collect()
          .map(_.getInt(0)).toSeq.map(Integer.valueOf)
        val clash = spark.read.parquet(path)
          .where(col("_gen") < gens && col("_centroid").isin(cells: _*))
          .select(col("id").cast("long").as("id"))
          .join(keyed.select("id"), Seq("id"), "left_semi")
          .limit(1).collect()
        require(clash.isEmpty,
          s"append contains ids already present in the layout at $path " +
            s"(e.g. id " +
            s"${clash.headOption.map(_.getLong(0)).getOrElse(-1L)})")
        // clear a crashed DIFFERENT-batch append's orphan at _gen=gens
        // first (r16 second review pass — the
        // VectorBuckets.writeGeneration argument): dynamic partition
        // overwrite alone keeps the orphan's untouched cells, and the
        // sidecar bump below would resurrect them
        VectorBuckets.clearOrphanGeneration(spark, path, gens)
        keyed.withColumn("_gen", lit(gens))
          .repartition(col("_centroid"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_gen", "_centroid").parquet(path)
        graft.core.FsIO.write(servingMetaPath(path),
          cellMetaJson(family, gens + 1)) // the commit point
      } catch {
        case e: Throwable =>
          // reopen the slot on a pre-commit failure: partial `_gen=N`
          // data is an orphan the next claimant's write clears
          graft.core.Generations.releaseClaim(spark, path, gens, tag)
          throw e
      }
    } finally keyed.unpersist()
  }

  /** Fold a generation cell layout's committed generations back to
    * `_gen=0`: committed rows re-land as one generation in a staging
    * sibling — sidecar included, so the promoted directory is born
    * complete — and swap in. Served results are identical before and
    * after; an orphan generation from a crashed append is dropped by
    * the committed filter; a post-compact append lands as `_gen=1`. */
  private[index] def compactCells(spark: org.apache.spark.sql.SparkSession,
      path: String, family: String): Unit = {
    val meta = validateCellMeta(path, family)
    val gens = meta.get("generations").asInt()
    if (gens <= 1) return // already compact
    val committed = spark.read.parquet(path)
      .where(col("_gen") < gens).drop("_gen")
    val staging = path + "__compacting"
    val st = new org.apache.hadoop.fs.Path(staging)
    val fs = st.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(st)) fs.delete(st, true)
    committed.withColumn("_gen", lit(0))
      .repartition(col("_centroid"))
      .write.mode("overwrite").partitionBy("_gen", "_centroid")
      .parquet(staging)
    graft.core.FsIO.write(servingMetaPath(staging),
      cellMetaJson(family, generations = 1))
    graft.core.Generations.swapInto(spark, path, staging)
  }

  /** [[DiskServing.rebuildServing]] for the cell families, family-
    * parameterized like every other cell op: the layout's live rows
    * (committed generations only, family aux columns stripped) retrain
    * a FRESH instance's codebook — the one thing appends deliberately
    * never touch (FAISS add-after-train) — and the retrained layout
    * stages + swaps in through [[writeServingCells]]. The calling
    * instance keeps its old codebook and is rejected by
    * [[validateCellMeta]] on its next serving call — by design: exactly
    * one codebook owns a layout's current state, and the returned fresh
    * strategy holds it. */
  private[index] def rebuildCells(spark: org.apache.spark.sql.SparkSession,
      path: String, family: String, auxCols: Seq[String],
      fresh: IndexStrategy with DiskServing): DiskServing.Rebuilt = {
    // localCheckpoint, not cache (second review pass): the swap below
    // REWRITES this frame's source files, so a recompute after block
    // eviction would silently read the new layout's generations —
    // truncating the lineage makes the pin load-bearing, not best-effort
    val rows = servingRows(spark, path, family)
      .drop(("_gen" +: "_centroid" +: auxCols): _*).localCheckpoint()
    val prepared = fresh.prepare(rows)
    fresh.writeServingIndex(prepared, path)
    DiskServing.Rebuilt(fresh, rows, prepared)
  }

  override def supportsRebuild: Boolean = true
  override protected def doRebuildServing(spark: org.apache.spark.sql.SparkSession,
      path: String): DiskServing.Rebuilt =
    rebuildCells(spark, path, name, Nil, this.copy())

  /** [[DiskServing.fsckServing]] for the cell families. Works untrained
    * (a doctor examines any layout, so the sidecar is parsed directly —
    * no codebook-equality gate); `family` is the calling family's tag,
    * checked against the sidecar's. The extra cell-specific invariant:
    * every committed `_centroid` value must be addressable by the
    * sidecar's codebook (`< nlist`) — an out-of-range cell would never
    * be probed, which is silent row loss, so `fail`. */
  private[index] def fsckCells(spark: org.apache.spark.sql.SparkSession,
      path: String, family: String): DataFrame = {
    import ServingFsck._
    val (fs0, p0) = {
      val p = new org.apache.hadoop.fs.Path(path)
      (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
    }
    if (!fs0.exists(p0)) // nothing at the path at all: one loud fail row
      return toDf(spark, Seq(Check("layout", "present", Fail, 0L)))
    // Guarded raw read (advice r16): flat-layout detection needs schema
    // inference over the directory, but an interrupted FIRST write —
    // directory present holding only `_temporary`/partial files, no
    // parquet footers — makes that read throw AnalysisException, which
    // would break the doctor's never-throw contract exactly where a
    // doctor is most needed. Degrade to a fail row plus the leftover
    // accounting (which surfaces the `_temporary` evidence itself).
    val raw =
      try spark.read.parquet(path)
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          return toDf(spark, Seq(Check("layout", "readable", Fail, 0L)) ++
            crashLeftovers(spark, path))
      }
    if (!raw.columns.contains("_gen"))
      // flat pre-generation layout ([[writeIndex]]): no sidecar, no
      // generations — the data-level invariants still hold
      return toDf(spark, Seq(rowCount(raw, "cells"),
        duplicateIds(raw, "cells")) ++ crashLeftovers(spark, path))
    val sc = sidecar(spark, servingMetaPath(path),
      Seq("family", "metric", "generations", "centroids"))
    if (sc.exists(_.status == Fail))
      return toDf(spark, sc ++ crashLeftovers(spark, path))
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.core.FsIO.read(servingMetaPath(path)))
    val gens = meta.get("generations").asInt()
    val nlist = meta.get("centroids").size()
    val committed = raw.where(col("_gen") < gens)
    val cellsSeen = committed.select("_centroid").distinct()
    val outOfRange = cellsSeen.where(col("_centroid") >= nlist ||
      col("_centroid") < 0).count()
    toDf(spark, sc ++
      Seq(Check("sidecar", "family_matches",
        if (meta.get("family").asText() == family) Ok else Fail,
        if (meta.get("family").asText() == family) 1L else 0L)) ++
      generations(spark, path, gens, "cells") ++
      Seq(rowCount(committed, "cells"),
        duplicateIds(committed, "cells"),
        Check("cells", "cells_within_nlist",
          if (outOfRange == 0) Ok else Fail, cellsSeen.count())) ++
      claims(spark, path, gens) ++
      crashLeftovers(spark, path))
  }

  /** the maintenance fence's committed counters ([[DiskServing]]) */
  override def committedCounts(spark: org.apache.spark.sql.SparkSession,
      path: String): Map[String, Int] =
    Map("del" -> 0, // delete leases never spend: any present = in flight
    "gen" -> graft.core.Generations.sidecarCount(
      servingMetaPath(path), "generations"))

  override def fsckServing(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = fsckCells(spark, path, name)

  override def writeServingIndex(prepared: DataFrame, path: String): Unit =
    writeServingCells(prepared, path, name)

  /** The cell families join the appendable set (r16): new rows assign
    * to the EXISTING codebook — FAISS `add` after `train`
    * (`faiss.py:157-161`) — and land as a committed generation of
    * exactly their cells. Returns the grown prepared frame, so the
    * facade's `insertIntoServing` keeps memory and layout in step. */
  override def supportsDiskAppend: Boolean = true
  override def appendToServing(spark: org.apache.spark.sql.SparkSession,
      path: String, prevPrepared: DataFrame, newRows: DataFrame,
      tag: String): DataFrame = {
    require(centroids != null, "IvfStrategy.prepare must run before append")
    val inc = prepare(newRows)
    appendPreparedCells(spark, path, name, inc, tag)
    prevPrepared.unionByName(inc)
  }

  /** fold the committed append generations back to one (r16) */
  override def supportsCompaction: Boolean = true
  override protected def doCompactServing(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = compactCells(spark, path, name)

  /** Disk-resident serving: answer top-k from the cell-partitioned parquet
    * layout [[writeIndex]] wrote, scanning ONLY the probed cells. The
    * distinct union of the batch's probe cells becomes a `_centroid IN`
    * predicate the scan resolves at the DIRECTORY level (Parquet partition
    * pruning — spec-asserted on the physical plan), so a query batch reads
    * ~nprobe/nlist of the index from storage: FAISS's inverted-list
    * pruning, served by the storage layer with NO resident index and no
    * warm-up scan. This is the 100 TB serving shape — the index lives as a
    * partitioned table, executors read only probed cells, and per-query
    * cell matching happens in the same broadcast equi-join as the
    * in-memory path, so results are identical to [[query]] on the
    * prepared frame (spec-pinned). */
  override def queryFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int): DataFrame = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    val pruned = servingRows(spark, path, name)
      .where(col("_centroid").isInCollection(probeCells(queries)))
    query(pruned, queries, k)
  }

  /** Filtered ANN off the disk layout — the "filtered vector search"
    * shape: a metadata predicate composed with the probe pruning, with
    * PRE-filter semantics (the q_knn_filtered convention: the predicate
    * lands before the kernel, so k results survive arbitrarily selective
    * filters — post-filtering a top-k can return fewer). Both reductions
    * reach the parquet reader: the probe IN-list prunes cell DIRECTORIES
    * and a simple-comparison predicate lands in PushedFilters to skip row
    * groups — at 100 TB a filtered query batch reads
    * ~nprobe/nlist × selectivity of the index and scores only survivors.
    * The metadata column rides in the index layout (prepare/writeIndex
    * pass extra store columns through untouched), so no side join is
    * needed at query time. */
  override def supportsDiskFiltered: Boolean = true
  override def queryFilteredFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, k: Int,
      predicate: org.apache.spark.sql.Column): DataFrame = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    val pruned = servingRows(spark, path, name)
      .where(col("_centroid").isInCollection(probeCells(queries)))
      .where(predicate)
    query(pruned, queries, k)
  }

  /** [[queryFromDisk]] for the range-search entry point: same
    * partition-pruned scan, same FAISS strict-`<` threshold semantics as
    * [[queryThreshold]] — the disk-resident index serves BOTH query
    * shapes through one layout. */
  override def supportsDiskThreshold: Boolean = true
  override def queryThresholdFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: DataFrame, threshold: Double,
      maxK: Int): DataFrame = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    val pruned = servingRows(spark, path, name)
      .where(col("_centroid").isInCollection(probeCells(queries)))
    queryThreshold(pruned, queries, threshold, maxK)
  }

  /** Partition-scoped DELETE on the disk-resident layout — the maintenance
    * op completing the serving story (append: [[appendToServing]],
    * compact: [[compactServing]], query/range: [[queryFromDisk]] /
    * [[queryThresholdFromDisk]]): remove rows by id, rewriting ONLY the
    * cells that contain them. Deletes arrive as `(id, vector)` — codebook
    * assignment is deterministic, so each delete's cell is COMPUTED from
    * its vector, never searched: no full-index scan, the read is
    * partition-pruned to the affected cells exactly like a query. At
    * 100 TB a delete batch touching c cells rewrites c/nlist of the index
    * and reads nothing else. Survivors land in a temp layout and swap in
    * per cell directory (the `compactIndex` idiom — never an in-place
    * overwrite of a path being read), which also handles the edge dynamic
    * partition overwrite silently skips: a cell emptied by the delete is
    * removed outright. Returns the number of rows removed. */
  override def supportsDiskDelete: Boolean = true
  override def deleteFromDisk(spark: org.apache.spark.sql.SparkSession,
      path: String, deletes: DataFrame, tag: String): Long =
    deleteCells(spark, path, name, deletes, tag)

  /** family-parameterized body of [[deleteFromDisk]] — the composed
    * families delegate here with their own tag so a generation layout's
    * sidecar validation names the right family. */
  private[index] def deleteCells(spark: org.apache.spark.sql.SparkSession,
      path: String, family: String, deletes: DataFrame,
      tag: String = graft.core.Generations.defaultWriterTag): Long =
      DiskServing.withDeleteLease(spark, path, tag) {
    require(centroids != null, "IvfStrategy.prepare must run before delete")
    val del = maybeNormalize(deletes, "vector")
      .select(col("id"),
        nearestCentroidsUdf(centroids, 1)(col("vector")).getItem(0)
          .as("_cell"))
    val cells = del.select("_cell").distinct().collect().map(_.getInt(0)).toSeq
    if (cells.isEmpty) 0L
    else if (!spark.read.parquet(path).columns.contains("_gen")) {
      // flat [[writeIndex]] layout — the shared partition-scoped rewrite
      // (review r14: this body WAS the idiom PartitionRewrite was
      // factored from, and the private copy had already drifted — it
      // lacked the leftover-temp pre-clear and the rename-aside rollback
      // the shared helper carries)
      val (before, after) = PartitionRewrite.dropIds(spark, path,
        "_centroid", cells, del.select("id"))
      before - after
    } else {
      // generation serving layout: the delete's cell is computed from
      // its vector but its GENERATION is not knowable from the batch, so
      // probe which committed (generation, cell) pairs actually hold the
      // ids (one cell-pruned, id-semi-joined read — bounded by the
      // batch) and rewrite only those directories
      val meta = validateCellMeta(path, family)
      val gens = meta.get("generations").asInt()
      val present = spark.read.parquet(path)
        .where(col("_gen") < gens &&
          col("_centroid").isin(cells.map(Integer.valueOf): _*))
        .join(del.select("id"), Seq("id"), "left_semi")
        .select(col("_gen").cast("int"), col("_centroid").cast("int"))
        .distinct().collect()
      if (present.isEmpty) 0L
      else {
        val grouped = present.groupBy(_.getInt(0)).map { case (g, rs) =>
          g -> rs.map(r => Integer.valueOf(r.getInt(1)): Any).toSeq
        }
        val (before, after) = PartitionRewrite.dropIdsByGen(spark, path,
          "_centroid", grouped, del.select("id"))
        before - after
      }
    }
  }

  /** distinct union of every query's nprobe nearest cells — the static
    * pruning predicate for strategies that compose over IVF cells */
  def probeCells(queries: DataFrame): Seq[Int] = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    val q = maybeNormalize(queries, "qvector")
    val nprobeEff = math.min(nprobe, centroids.length)
    q.select(explode(nearestCentroidsUdf(centroids, nprobeEff)(col("qvector"))))
      .distinct().collect().map(_.getInt(0)).toSeq
  }

  private def candidates(prepared: DataFrame, queries: DataFrame,
      probes: Int): DataFrame = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    val q = maybeNormalize(queries, "qvector")
    val nprobeEff = math.min(probes, centroids.length)
    val qProbes = q.withColumn("_probe",
      explode(nearestCentroidsUdf(centroids, nprobeEff)(col("qvector"))))
      .select(col("query_id"), col("qvector"), col("_probe"))
    val d = metric match {
      // pre-normalized: cosine == 1 - dot (faiss.py:150-155)
      case Metric.Cosine =>
        VectorFunctions.inner_product_distance(col("vector"), col("qvector"))
      case m => VectorFunctions.distance(m)(col("vector"), col("qvector"))
    }
    prepared.join(broadcast(qProbes),
        prepared("_centroid") === qProbes("_probe"))
      .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"))
  }

  def query(prepared: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    TopK.topKPerGroup(candidates(prepared, queries, nprobe),
      Seq("query_id"), "id", "dist", k)
  }

  /** rows actually scored = Σ over (query, probed cell) of |cell| — the
    * pruning ratio vs brute force is the IVF speed story in one number */
  override def scanVolume(prepared: DataFrame, queries: DataFrame): Long = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    val q = maybeNormalize(queries, "qvector")
    val nprobeEff = math.min(nprobe, centroids.length)
    val qProbes = q.select(
      explode(nearestCentroidsUdf(centroids, nprobeEff)(col("qvector")))
        .as("_probe"))
    val cellSizes = prepared.groupBy("_centroid").count()
    val total = qProbes.join(cellSizes, qProbes("_probe") === cellSizes("_centroid"))
      .agg(sum("count")).head.get(0)
    if (total == null) 0L else total.asInstanceOf[Long]
  }

  /** Recall-vs-cost tuning curve — the number a 100 TB deployment
    * actually tunes: for each nprobe in `probes`, recall@k against the
    * exact top-k and the fraction of the store scanned. ONE scored
    * kernel pass at max(probes) serves every point: the probe explode
    * carries its PROBE RANK (position in the query's nearest-cell
    * list), so the candidate set at a smaller nprobe is a rank filter
    * on the same cached frame — the sweep costs one scan plus
    * per-point bounded selections, not |probes| scans. Deterministic
    * end to end (seeded KMeans, canonical tie-breaks), so the curve is
    * a stable artifact: recall is nondecreasing in nprobe and reaches
    * exactly 1.0 at nprobe = nlist (spec-pinned), where scanned
    * fraction reaches exactly 1. */
  def nprobeCurve(prepared: DataFrame, queries: DataFrame, k: Int,
      probes: Seq[Int]): DataFrame = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    require(probes.nonEmpty && k >= 1)
    val ps = probes.distinct.sorted.map(p => math.min(p, centroids.length))
    val q = maybeNormalize(queries, "qvector")
    val qProbes = q.select(col("query_id"), col("qvector"),
        posexplode(nearestCentroidsUdf(centroids, ps.max)(col("qvector"))))
      .toDF("query_id", "qvector", "_rank", "_probe")
    val d = metric match {
      case Metric.Cosine =>
        VectorFunctions.inner_product_distance(col("vector"), col("qvector"))
      case m => VectorFunctions.distance(m)(col("vector"), col("qvector"))
    }
    val scored = prepared.join(broadcast(qProbes),
        prepared("_centroid") === qProbes("_probe"))
      .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"),
        col("_rank"))
      .cache()
    // ground truth needs the full store in the scored frame: demand the
    // exact point in the sweep rather than silently grading against a
    // pruned "truth"
    require(ps.max == centroids.length,
      s"probes must include nlist=${centroids.length} for exact ground truth")
    val exact = TopK.topKPerGroup(
        scored.select("query_id", "id", "dist"),
        Seq("query_id"), "id", "dist", k)
      .select(col("query_id"), col("id"))
    // ONE sweep job: every (pair, sweep point) with the pair's probe rank
    // under the point's nprobe feeds a single bounded-heap pass grouped by
    // (query, nprobe); hits and scan volumes aggregate per point
    val pArr = array(ps.map(p => lit(p.toLong)): _*)
    val swept = scored.withColumn("nprobe", explode(pArr))
      .where(col("_rank") < col("nprobe"))
    val hits = TopK.topKPerGroup(
        swept.select("query_id", "nprobe", "id", "dist"),
        Seq("query_id", "nprobe"), "id", "dist", k)
      .join(exact, Seq("query_id", "id"), "left_semi")
      .groupBy("nprobe").agg(count(lit(1)).as("_hits"))
    val cellSizes = prepared.groupBy("_centroid").count()
    val scanned = qProbes.withColumn("nprobe", explode(pArr))
      .where(col("_rank") < col("nprobe"))
      .join(cellSizes, qProbes("_probe") === cellSizes("_centroid"))
      .groupBy("nprobe").agg(sum("count").as("_scanned"))
    val nQ = q.agg(count(lit(1)).as("_nq"))
    val nRows = prepared.agg(count(lit(1)).as("_nrows"))
    // scanned has every sweep point (rank 0 < p always); a zero-hit point
    // must still emit its row
    scanned.join(hits, Seq("nprobe"), "left")
      .withColumn("_hits", coalesce(col("_hits"), lit(0L)))
      .crossJoin(nQ).crossJoin(nRows)
      .select(col("nprobe"),
        round(col("_hits").cast("double")
          / (col("_nq") * k).cast("double"), 4).as("recall"),
        round(col("_scanned").cast("double")
          / (col("_nq") * col("_nrows")).cast("double"), 6).as("scan_frac"))
  }

  /** UNCAPPED within the probed cells — FAISS IVF is a range-search index,
    * so its threshold path ignores `max_k` entirely and returns every
    * candidate with `dist < threshold` (`faiss.py:18-23`, `175-183`). */
  def queryThreshold(prepared: DataFrame, queries: DataFrame,
      threshold: Double, maxK: Int): DataFrame =
    candidates(prepared, queries, nprobe)
      .where(col("dist") < IndexStrategy.faissRangeBound(metric, threshold))

  /** Distributed ANN self-join: each row's approximate k nearest OTHER
    * rows with NO broadcast and NO driver collect on either side — the
    * 100 TB compute path for similarity self-joins (the exact blocked
    * kernel in `Knn.selfJoin` is O(n²) compute by definition; this is
    * O(Σ_cell |cell| · |probes into cell|)). The store keys by its single
    * assigned cell, the query side (the same frame) explodes to its
    * nprobe nearest cells, and the cell equi-join shuffles by cell id;
    * a (query, candidate) pair arises at most once because the candidate
    * owns exactly one cell. With nprobe = nlist the candidate set is all
    * pairs and the output EQUALS the exact self-join (spec-asserted).
    */
  def selfJoin(prepared: DataFrame, k: Int, probes: Int = 0): DataFrame = {
    require(centroids != null, "IvfStrategy.prepare must run before query")
    require(k >= 1, s"k must be >= 1, got $k")
    // probes <= 0 means the instance's nprobe; probes = nlist is exact
    val nprobeEff = math.min(if (probes > 0) probes else nprobe,
      centroids.length)
    val probeSide = prepared.select(col("id").as("query_id"),
      col("vector").as("qvector"),
      explode(nearestCentroidsUdf(centroids, nprobeEff)(col("vector")))
        .as("_probe"))
    val d = metric match {
      case Metric.Cosine =>
        VectorFunctions.inner_product_distance(col("vector"), col("qvector"))
      case m => VectorFunctions.distance(m)(col("vector"), col("qvector"))
    }
    val pairs = prepared.select(col("id"), col("vector"), col("_centroid"))
      .join(probeSide, col("_centroid") === col("_probe"))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), greatest(d, lit(0.0)).as("dist"))
    TopK.topKPerGroup(pairs, Seq("query_id"), "id", "dist", k)
  }
}
