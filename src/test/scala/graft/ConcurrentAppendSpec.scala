package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Generations, Metric}
import graft.index.{IvfStrategy, LshStrategy}

/** The multi-writer append protocol (r17, verdict r16 #1 —
  * [[Generations.claimAppendGeneration]]): every layout family's append
  * reads the sidecar's committed count N, writes `_gen=N`, and bumps the
  * sidecar — exactly-once for ONE writer, but two CONCURRENT writers
  * would both claim slot N and dynamic-overwrite each other's
  * partitions before both "commit". The claim protocol serializes the
  * slot with a create-exclusive claim file per generation:
  *
  *  - distinct writers landing sequentially contend-and-advance — the
  *    second writer's claim of the spent slot is refused, it re-reads
  *    the advanced sidecar, and claims the next slot (both generations
  *    commit distinctly; the `q_ivf_concurrent_append` oracle pins the
  *    served completeness of exactly this sequence);
  *  - an IN-FLIGHT (or crashed) foreign claim whose sidecar has not
  *    advanced fails loudly with both tags named — in either
  *    interleaving order;
  *  - a same-tag replay of a crashed append reclaims its own slot (the
  *    at-least-once-stays-exactly-once discipline is unchanged);
  *  - a failure after the claim and before the sidecar commit releases
  *    the slot, so a refused batch never wedges the layout;
  *  - compaction resets the generation count AND the claim ledger;
  *  - the doctor reports the ledger: spent claims ok, unresolved warn.
  */
class ConcurrentAppendSpec extends SparkSpec {
  import spark.implicits._

  private lazy val store: DataFrame = sf("embeddings")
    .select($"vec_id".as("id"),
      $"embedding".cast("array<double>").as("vector"))
    .cache()
  private lazy val queries: DataFrame = store.where($"id" < 5)
    .select($"id".as("query_id"), $"vector".as("qvector"))

  private def tmp(tag: String): String = graft.VerifyIO.scratchDir(s"graft_conc_$tag").resolve("index").toString

  private def lsh() = LshStrategy(Metric.Cosine, nTables = 8, nBits = 5)

  test("two distinct-tag writers commit distinct generations; reads " +
      "see both; the ledger records both claims as spent") {
    val strat = lsh()
    val prepared = strat.prepare(store).cache()
    val path = tmp("seq")
    strat.writeServingIndex(prepared.where($"id" < 300), path)
    strat.appendServingIndex(spark, path,
      store.where($"id" >= 300 && $"id" < 400), "writer-A")
    strat.appendServingIndex(spark, path, store.where($"id" >= 400),
      "writer-B")
    assert(Generations.listClaims(spark, path)
      === Seq((1, "writer-A"), (2, "writer-B")))
    val meta = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(graft.core.FsIO.read(s"$path/_lsh_meta.json"))
    assert(meta.get("generations").asInt() === 3)
    // both writers' rows serve: grown layout == fresh full-store build
    val mem = strat.query(prepared, queries, 10).collect().toSet
    assert(strat.queryFromDisk(spark, path, queries, 10).collect().toSet
      === mem, "a concurrent-writer generation was lost or clobbered")
    // doctor: two spent claims, zero unresolved — all ok
    val fsck = strat.fsckServing(spark, path).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getString(2), r.getLong(3)))).toMap
    assert(fsck(("claims", "spent")) === (("ok", 2L)))
    assert(fsck(("claims", "unresolved")) === (("ok", 0L)))
    prepared.unpersist()
  }

  test("contend-and-advance: a writer that read a stale sidecar retries " +
      "at the committed slot instead of failing") {
    val path = tmp("advance")
    val strat = lsh()
    val prepared = strat.prepare(store.where($"id" < 100)).cache()
    strat.writeServingIndex(prepared, path)
    strat.appendServingIndex(spark, path,
      store.where($"id" >= 100 && $"id" < 150), "writer-A")
    // writer B's first sidecar read predates A's commit: readGens serves
    // the stale value once, then the real sidecar — the claim must land
    // on slot 2, not fail on A's spent claim of slot 1
    var calls = 0
    val got = Generations.claimAppendGeneration(spark, path, "writer-B",
      () => { calls += 1; if (calls == 1) 1 else 2 })
    assert(got === 2)
    Generations.releaseClaim(spark, path, 2, "writer-B")
    prepared.unpersist()
  }

  test("in-flight foreign claim fails loudly with both tags, in both " +
      "interleaving orders; breakClaim reopens the slot") {
    Seq(("writer-X", "writer-Y"), ("writer-Y", "writer-X")).foreach {
      case (holder, contender) =>
        val path = tmp("conflict")
        val strat = lsh()
        val prepared = strat.prepare(store.where($"id" < 200)).cache()
        strat.writeServingIndex(prepared, path)
        // the holder claims the next slot and is still in flight
        assert(Generations.claimAppendGeneration(spark, path, holder,
          () => 1) === 1)
        val e = intercept[IllegalStateException] {
          strat.appendServingIndex(spark, path,
            store.where($"id" >= 200 && $"id" < 250), contender)
        }
        assert(e.getMessage.contains(holder) &&
          e.getMessage.contains(contender),
          "the conflict must name both writers")
        // the doctor sees the unresolved claim as a warn
        val fsck = strat.fsckServing(spark, path).collect()
          .map(r => ((r.getString(0), r.getString(1)),
            (r.getString(2), r.getLong(3)))).toMap
        assert(fsck(("claims", "unresolved")) === (("warn", 1L)))
        // operator override: break the dead holder's claim → the
        // contender's append goes through at the reopened slot
        Generations.breakClaim(spark, path, 1)
        strat.appendServingIndex(spark, path,
          store.where($"id" >= 200 && $"id" < 250), contender)
        assert(Generations.listClaims(spark, path)
          === Seq((1, contender)))
        prepared.unpersist()
    }
  }

  test("same-tag replay of a crashed append reclaims its own slot; a " +
      "foreign tag is refused until the replay or a break") {
    val path = tmp("replay")
    val strat = lsh()
    val prepared = strat.prepare(store.where($"id" < 300)).cache()
    strat.writeServingIndex(prepared, path)
    val delta = store.where($"id" >= 300 && $"id" < 400)
    strat.appendServingIndex(spark, path, delta, "writer-A")
    // simulate the crash window: data + claim written, sidecar commit
    // lost — rewind generations to 1 (the ScaleDesignSpec idiom)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(graft.core.FsIO.read(s"$path/_lsh_meta.json"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    meta.put("generations", 1)
    graft.core.FsIO.write(s"$path/_lsh_meta.json",
      mapper.writeValueAsString(meta))
    // a DIFFERENT writer cannot take the half-committed slot…
    val other = lsh()
    intercept[IllegalStateException] {
      other.appendServingIndex(spark, path,
        store.where($"id" >= 400 && $"id" < 450), "writer-B")
    }
    // …but the owner's replay reclaims it and converges exactly-once
    strat.appendServingIndex(spark, path, delta, "writer-A")
    val mem = strat.query(strat.prepare(store.where($"id" < 400)),
      queries, 10).collect().toSet
    assert(strat.queryFromDisk(spark, path, queries, 10).collect().toSet
      === mem, "replayed append did not converge to the full answer")
    prepared.unpersist()
  }

  test("a guard-refused append releases its claim — the slot is not " +
      "wedged for other writers") {
    val path = tmp("release")
    val strat = lsh()
    val prepared = strat.prepare(store.where($"id" < 300)).cache()
    strat.writeServingIndex(prepared, path)
    // ids already present → the freshness guard refuses AFTER the claim
    intercept[IllegalArgumentException] {
      strat.appendServingIndex(spark, path, store.where($"id" < 50),
        "writer-A")
    }
    assert(Generations.listClaims(spark, path).isEmpty,
      "a refused append must not leave its claim behind")
    // a different writer appends fresh rows at the same slot
    strat.appendServingIndex(spark, path,
      store.where($"id" >= 300 && $"id" < 350), "writer-B")
    assert(Generations.listClaims(spark, path) === Seq((1, "writer-B")))
    prepared.unpersist()
  }

  test("compaction folds generations AND resets the claim ledger; the " +
      "first post-compact append claims slot 1 cleanly") {
    val path = tmp("compact")
    val strat = lsh()
    val prepared = strat.prepare(store.where($"id" < 300)).cache()
    strat.writeServingIndex(prepared, path)
    strat.appendServingIndex(spark, path,
      store.where($"id" >= 300 && $"id" < 400), "writer-A")
    assert(Generations.listClaims(spark, path).nonEmpty)
    strat.compactServing(spark, path)
    assert(Generations.listClaims(spark, path).isEmpty,
      "compaction must sweep the spent claims with the count reset")
    strat.appendServingIndex(spark, path,
      store.where($"id" >= 400 && $"id" < 450), "writer-B")
    assert(Generations.listClaims(spark, path) === Seq((1, "writer-B")))
    val mem = strat.query(strat.prepare(store.where($"id" < 450)),
      queries, 10).collect().toSet
    assert(strat.queryFromDisk(spark, path, queries, 10).collect().toSet
      === mem)
    prepared.unpersist()
  }

  test("facade insertIntoServing carries the writer tag to the claim; " +
      "fleet doctor surfaces the ledger per layout") {
    import graft.api.Vicinity
    import graft.core.Backend
    val rnd = new scala.util.Random(11)
    val vectors = Seq.fill(60)(Seq.fill(8)(rnd.nextDouble()))
    val items = (0 until 60).map(i => s"item$i")
    val v = Vicinity.fromVectorsAndItems(spark, items.take(50),
      vectors.take(50), Backend.Hnsw)
    val root = graft.VerifyIO.scratchDir("graft_conc_fleet").toString
    val path = s"$root/serving_hnsw"
    v.writeServingIndex(path)
    val v2 = v.insertIntoServing(path, items.slice(50, 55),
      vectors.slice(50, 55), writerTag = Some("ingest-1"))
    v2.insertIntoServing(path, items.slice(55, 60),
      vectors.slice(55, 60), writerTag = Some("ingest-2"))
    assert(Generations.listClaims(spark, path)
      === Seq((1, "ingest-1"), (2, "ingest-2")))
    // the fleet doctor reports the same layout's ledger in its frame
    val fleet = Vicinity.fsckAll(spark, root).collect()
      .map(r => ((r.getString(0), r.getString(2), r.getString(3)),
        (r.getString(4), r.getLong(5)))).toMap
    assert(fleet(("serving_hnsw", "claims", "spent")) === (("ok", 2L)))
    assert(fleet(("serving_hnsw", "claims", "unresolved")) === (("ok", 0L)))
  }

  test("fleet doctor: a conflicted layout's unresolved claim rides the " +
      "fleet frame as warn; a foreign child is a loud fail row") {
    val root = graft.VerifyIO.scratchDir("graft_conc_fleet2").toString
    val strat = lsh()
    val prepared = strat.prepare(store.where($"id" < 100)).cache()
    strat.writeServingIndex(prepared, s"$root/lshA")
    // an in-flight (or crashed) claim on the next slot
    Generations.claimAppendGeneration(spark, s"$root/lshA", "ghost",
      () => 1)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "not_a_layout"))
    // a stray PLAIN FILE is just as foreign as an unrecognized dir
    // (advice r17: the dirs-only filter used to skip it silently);
    // write metadata stays exempt
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "stray.txt"), "junk".getBytes)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "_SUCCESS"), Array.empty[Byte])
    val fleet = graft.api.Vicinity.fsckAll(spark, root).collect()
      .map(r => ((r.getString(0), r.getString(2), r.getString(3)),
        (r.getString(4), r.getLong(5)))).toMap
    assert(fleet(("lshA", "claims", "unresolved")) === (("warn", 1L)))
    assert(fleet(("not_a_layout", "layout", "recognized"))
      === (("fail", 0L)))
    assert(fleet(("stray.txt", "layout", "recognized")) === (("fail", 0L)))
    assert(!fleet.contains(("_SUCCESS", "layout", "recognized")))
    prepared.unpersist()
  }

  test("graph deletes: concurrent deleters race the TOMBSTONE slot — " +
      "claims serialize it; no-op deletes release; doctor reports") {
    import graft.index.HnswStrategy
    val path = tmp("tomb")
    val strat = HnswStrategy(Metric.Cosine, m = 4)
    val prepared = strat.prepare(store.where($"id" < 200)).cache()
    prepared.count()
    strat.writeGraphIndex(prepared, path)
    val n1 = strat.deleteFromDisk(spark, path,
      store.where($"id" < 3).select($"id"), "deleter-A")
    assert(n1 === 3)
    assert(Generations.listClaims(spark, path, slot = "tomb")
      === Seq((0, "deleter-A")))
    // an in-flight foreign claim on the next tombstone slot blocks
    // deleter B loudly, naming the slot kind and the holder
    Generations.claimAppendGeneration(spark, path, "ghost", () => 1,
      slot = "tomb")
    val e = intercept[IllegalStateException] {
      strat.deleteFromDisk(spark, path,
        store.where($"id" >= 3 && $"id" < 5).select($"id"), "deleter-B")
    }
    assert(e.getMessage.contains("ghost") &&
      e.getMessage.contains("tomb"))
    Generations.breakClaim(spark, path, 1, slot = "tomb")
    val n2 = strat.deleteFromDisk(spark, path,
      store.where($"id" >= 3 && $"id" < 5).select($"id"), "deleter-B")
    assert(n2 === 2)
    assert(Generations.listClaims(spark, path, slot = "tomb")
      === Seq((0, "deleter-A"), (1, "deleter-B")))
    // a delete of already-tombstoned ids is a no-op and must not leave
    // an unresolved claim wedging the slot
    val n3 = strat.deleteFromDisk(spark, path,
      store.where($"id" < 5).select($"id"))
    assert(n3 === 0)
    assert(Generations.listClaims(spark, path, slot = "tomb").length === 2)
    // both slots' ledgers ride the doctor frame, all spent
    val fsck = strat.fsckServing(spark, path).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getString(2), r.getLong(3)))).toMap
    assert(fsck(("tomb_claims", "spent")) === (("ok", 2L)))
    assert(fsck(("tomb_claims", "unresolved")) === (("ok", 0L)))
    assert(fsck(("claims", "spent")) === (("ok", 0L)))
    prepared.unpersist()
  }

  test("cell family (IVF): distinct writers commit distinct generations " +
      "through the shared claim path; conflict detected") {
    val path = tmp("ivf")
    val strat = IvfStrategy(Metric.Cosine, nlist = 8, nprobe = 8)
    val prep = strat.prepare(store.where($"id" < 300)).cache()
    prep.count()
    strat.writeServingIndex(prep, path)
    val grown = strat.appendToServing(spark, path, prep,
      store.where($"id" >= 300 && $"id" < 400), "writer-A")
    strat.appendToServing(spark, path, grown,
      store.where($"id" >= 400 && $"id" < 450), "writer-B")
    assert(Generations.listClaims(spark, path)
      === Seq((1, "writer-A"), (2, "writer-B")))
    // nprobe = nlist → provably exact: both increments fully served
    val exact = strat.query(strat.prepare(store.where($"id" < 450)),
      queries, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val disk = strat.queryFromDisk(spark, path, queries, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(disk === exact)
    // an in-flight foreign claim blocks the cell append loudly too
    assert(Generations.claimAppendGeneration(spark, path, "writer-C",
      () => 3) === 3)
    val e = intercept[IllegalStateException] {
      strat.appendToServing(spark, path, grown,
        store.where($"id" >= 450 && $"id" < 500), "writer-D")
    }
    assert(e.getMessage.contains("writer-C"))
    prep.unpersist()
  }

  test("maintenance fence: compact refuses while a writer claim is " +
      "unresolved; append refuses while the marker is held — both " +
      "orders fail loudly; doctor reports the marker") {
    val path = tmp("fence")
    val strat = lsh()
    val prepared = strat.prepare(store.where($"id" < 300)).cache()
    strat.writeServingIndex(prepared, path)
    strat.appendServingIndex(spark, path,
      store.where($"id" >= 300 && $"id" < 400), "writer-A")
    // order 1: append (claim) first, then maintenance — compact refuses
    Generations.claimAppendGeneration(spark, path, "ghost", () => 2)
    val e1 = intercept[IllegalStateException] {
      strat.compactServing(spark, path)
    }
    assert(e1.getMessage.contains("ghost") &&
      e1.getMessage.contains("unresolved"),
      "the refusal must name the in-flight writer")
    assert(Generations.maintenanceHolder(spark, path).isEmpty,
      "a refused maintenance must not leave its marker behind")
    Generations.breakClaim(spark, path, 2)
    // order 2: maintenance first, then append — the writer refuses
    Generations.beginMaintenance(spark, path, "maintainer",
      Map("gen" -> 2))
    val e2 = intercept[IllegalStateException] {
      strat.appendServingIndex(spark, path,
        store.where($"id" >= 400 && $"id" < 450), "writer-A")
    }
    assert(e2.getMessage.contains("maintainer") &&
      e2.getMessage.contains("maintenance"))
    assert(Generations.listClaims(spark, path).map(_._1) === Seq(1),
      "the fenced-out append must release its slot claim")
    // a second maintainer is refused while the marker is held; the SAME
    // tag reclaims it (a crashed maintenance's re-run)
    val e3 = intercept[IllegalStateException] {
      Generations.beginMaintenance(spark, path, "maintainer-2",
        Map("gen" -> 2))
    }
    assert(e3.getMessage.contains("maintainer"))
    Generations.beginMaintenance(spark, path, "maintainer",
      Map("gen" -> 2)) // same-tag reclaim succeeds
    // the doctor reports the held marker as a warn
    val fsck = strat.fsckServing(spark, path).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getString(2), r.getLong(3)))).toMap
    assert(fsck(("claims", "maintenance_marker")) === (("warn", 1L)))
    Generations.endMaintenance(spark, path, "maintainer")
    // fence clear: compact folds and sweeps; the append lands cleanly
    strat.compactServing(spark, path)
    assert(Generations.listClaims(spark, path).isEmpty)
    strat.appendServingIndex(spark, path,
      store.where($"id" >= 400 && $"id" < 450), "writer-B")
    val mem = strat.query(strat.prepare(store.where($"id" < 450)),
      queries, 10).collect().toSet
    assert(strat.queryFromDisk(spark, path, queries, 10).collect().toSet
      === mem)
    prepared.unpersist()
  }

  test("cross-kind commits are disjoint: an append never touches the " +
      "tombstone sidecar, a delete never touches the graph meta — so " +
      "neither can revert the other's concurrent commit") {
    import graft.index.{GraphLayout, HnswStrategy}
    val path = tmp("crosskind")
    val strat = HnswStrategy(Metric.Cosine, m = 4)
    val prepared = strat.prepare(store.where($"id" < 200)).cache()
    prepared.count()
    strat.writeGraphIndex(prepared, path)
    // a delete commits first (tombstone counter -> 1)
    assert(strat.deleteFromDisk(spark, path,
      store.where($"id" < 3).select($"id"), "deleter") === 3)
    val tombBytes = graft.core.FsIO.read(s"$path/_tomb_meta.json")
    // the append's commit must leave the tombstone sidecar BYTE-IDENTICAL
    // (the advice-r17 race: the old shared-file commit rewrote the
    // tombstone counter captured BEFORE the append's claim, silently
    // reverting any delete committed in between)
    strat.appendGraphIndex(prepared,
      store.where($"id" >= 200 && $"id" < 220), path, "appender")
    assert(graft.core.FsIO.read(s"$path/_tomb_meta.json") === tombBytes,
      "an append rewrote the tombstone sidecar")
    assert(GraphLayout.tombstoneGens(path) === 1,
      "the delete's committed counter was reverted")
    // and symmetrically: a delete's commit must leave the graph meta
    // byte-identical (generations + entries are the append side's)
    val metaBytes = graft.core.FsIO.read(s"$path/_graph_meta.json")
    // delete one JUST-APPENDED id: the live-row read must see the fresh
    // append generation (the advice-r17 stale-gens read silently
    // no-op'd exactly this delete)
    assert(strat.deleteFromDisk(spark, path,
      store.where($"id" === 205).select($"id"), "deleter") === 1,
      "a just-appended id was invisible to the delete's live-row read")
    assert(graft.core.FsIO.read(s"$path/_graph_meta.json") === metaBytes,
      "a delete rewrote the graph meta")
    // served state reflects BOTH kinds of commit
    val dsk = strat.queryExhaustiveFromDisk(spark, path, queries, 300)
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(!dsk.exists(id => id < 3 || id == 205L),
      "a deleted id is still served")
    assert(dsk.contains(201L), "an appended row was lost")
    prepared.unpersist()
  }

  test("rewrite-family deletes hold the del lease: delete-vs-maintenance " +
      "fails loudly in both orders; concurrent deleters serialize") {
    val path = tmp("dellease")
    val strat = lsh()
    val prepared = strat.prepare(store.where($"id" < 300)).cache()
    strat.writeServingIndex(prepared, path)
    // order 1: maintenance first — the delete's lease claim sees the
    // marker and refuses
    Generations.beginMaintenance(spark, path, "maintainer",
      Map("gen" -> 1, "del" -> 0))
    val e1 = intercept[IllegalStateException] {
      strat.deleteFromDisk(spark, path,
        store.where($"id" < 2).select($"id"), "deleter-A")
    }
    assert(e1.getMessage.contains("maintenance"))
    assert(Generations.listClaims(spark, path, slot = "del").isEmpty,
      "a fenced-out delete must release its lease")
    Generations.endMaintenance(spark, path, "maintainer")
    // order 2: delete in flight (lease held) — maintenance refuses,
    // and a SECOND deleter refuses too (survivor rewrites would race)
    Generations.claimAppendGeneration(spark, path, "deleter-A",
      () => 0, slot = "del")
    val e2 = intercept[IllegalStateException] {
      strat.compactServing(spark, path)
    }
    assert(e2.getMessage.contains("deleter-A") &&
      e2.getMessage.contains("del"))
    val e3 = intercept[IllegalStateException] {
      strat.deleteFromDisk(spark, path,
        store.where($"id" < 2).select($"id"), "deleter-B")
    }
    assert(e3.getMessage.contains("deleter-A"))
    Generations.releaseClaim(spark, path, 0, "deleter-A", slot = "del")
    // lease released: the delete lands and leaves NO claim behind
    assert(strat.deleteFromDisk(spark, path,
      store.where($"id" < 2).select($"id"), "deleter-B") === 2)
    assert(Generations.listClaims(spark, path, slot = "del").isEmpty,
      "a completed delete must not leave its lease behind")
    val dsk = strat.queryFromDisk(spark, path, queries, 10).collect()
    assert(dsk.nonEmpty && !dsk.exists(_.getLong(1) < 2L))
    prepared.unpersist()
  }

  test("a pre-r18 claim file (tag in content, no dot) stays VISIBLE: it " +
      "blocks contenders loudly and breakClaim clears it") {
    val path = tmp("legacyclaim")
    val strat = lsh()
    val prepared = strat.prepare(store.where($"id" < 100)).cache()
    strat.writeServingIndex(prepared, path)
    // plant an old-format claim: digits-only name, tag in content
    val dir = new org.apache.hadoop.fs.Path(s"$path/_claims")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val out = fs.create(new org.apache.hadoop.fs.Path(dir, "gen-1"), false)
    out.write("old-writer".getBytes("UTF-8")); out.close()
    // a contender must NOT silently win over the legacy claim
    val e = intercept[IllegalStateException] {
      strat.appendServingIndex(spark, path,
        store.where($"id" >= 100 && $"id" < 150), "writer-B")
    }
    assert(e.getMessage.contains("pre-r18"))
    assert(Generations.listClaims(spark, path).map(_._1) === Seq(1))
    // the operator override clears it; the contender proceeds
    Generations.breakClaim(spark, path, 1)
    strat.appendServingIndex(spark, path,
      store.where($"id" >= 100 && $"id" < 150), "writer-B")
    assert(Generations.listClaims(spark, path) === Seq((1, "writer-B")))
    prepared.unpersist()
  }

  test("a pre-split graph layout's tombstone counter (inside the graph " +
      "meta) is still honored — committed tombstones don't resurrect") {
    import graft.index.{GraphLayout, HnswStrategy}
    val path = tmp("legacytomb")
    val strat = HnswStrategy(Metric.Cosine, m = 4)
    val prepared = strat.prepare(store.where($"id" < 100)).cache()
    prepared.count()
    strat.writeGraphIndex(prepared, path)
    assert(strat.deleteFromDisk(spark, path,
      store.where($"id" < 3).select($"id"), "deleter") === 3)
    // simulate the pre-split format: counter inside _graph_meta.json,
    // no _tomb_meta.json
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(
      graft.core.FsIO.read(s"$path/_graph_meta.json"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    meta.put("tombstone_generations", 1)
    graft.core.FsIO.write(s"$path/_graph_meta.json",
      mapper.writeValueAsString(meta))
    val fs = new org.apache.hadoop.fs.Path(s"$path/_tomb_meta.json")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_tomb_meta.json"),
      false)
    assert(GraphLayout.tombstoneGens(path) === 1,
      "the legacy counter must be read, not silently treated as 0")
    val dsk = strat.queryExhaustiveFromDisk(spark, path, queries, 100)
      .select("id").distinct().collect().map(_.getLong(0)).toSet
    assert(!dsk.exists(_ < 3L),
      "a pre-split layout's committed tombstones resurrected")
    prepared.unpersist()
  }

  test("a reader racing the compaction swap rides the two-rename " +
      "window: readSwapSafe serves the retired state, deterministically " +
      "injected between the renames") {
    import spark.implicits._
    val root = graft.VerifyIO.scratchDir("graft_swaprace").toString
    val path = s"$root/snap"
    (1L to 100L).toDF("v").withColumn("_batch", lit("b0"))
      .write.partitionBy("_batch").parquet(path)
    (101L to 150L).toDF("v").withColumn("_batch", lit("b1"))
      .write.mode("append").partitionBy("_batch").parquet(path)
    // stage the folded state, then swap with a reader IN the window
    val staging = path + "__compacting"
    spark.read.parquet(path).drop("_batch")
      .withColumn("_batch", lit("compact"))
      .write.partitionBy("_batch").parquet(staging)
    var plainFailed = false
    var windowRows = -1L
    Generations.swapInto(spark, path, staging, betweenRenames = () => {
      // prove the injection sits in the real no-live-dir instant
      plainFailed =
        try { spark.read.parquet(path); false }
        catch { case _: org.apache.spark.sql.AnalysisException => true }
      // the swap-safe read falls back to the retired dir — the complete
      // pre-compact state (compaction never changes visible content)
      windowRows = Generations.readSwapSafe(spark, path).count()
    })
    assert(plainFailed, "the injection hook must hit the swap window")
    assert(windowRows === 150L,
      "readSwapSafe must serve the full pre-compact state in the window")
    // post-swap: the promoted store serves the same rows, one generation
    val after = spark.read.parquet(path)
    assert(after.count() === 150L)
    assert(after.select("_batch").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("compact"))
  }

  test("claim identity rides the file NAME: an empty crashed claim is " +
      "reclaimable by its own tag and names its holder to a rival") {
    val path = tmp("atomic")
    val strat = lsh()
    val prepared = strat.prepare(store.where($"id" < 100)).cache()
    strat.writeServingIndex(prepared, path)
    // simulate the old protocol's fatal crash window: a claim file on
    // disk with NO content — under the name-carries-identity format the
    // tag survives any write crash because there is nothing to write
    val dir = new org.apache.hadoop.fs.Path(s"$path/_claims")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    fs.create(new org.apache.hadoop.fs.Path(dir,
      "gen-1.writer-A"), false).close()
    // a rival sees the crashed holder BY NAME
    val e = intercept[IllegalStateException] {
      Generations.claimAppendGeneration(spark, path, "writer-B", () => 1)
    }
    assert(e.getMessage.contains("writer-A"))
    // the owner's replay reclaims it — the exact guarantee the old
    // content-carries-identity format broke on an empty claim
    assert(Generations.claimAppendGeneration(spark, path, "writer-A",
      () => 1) === 1)
    // tags with filesystem-hostile characters round-trip through the
    // URL encoding (the default tag is pid@host)
    val odd = "stream-4/2 q?x@host"
    assert(Generations.claimAppendGeneration(spark, path, odd,
      () => 2) === 2)
    assert(Generations.listClaims(spark, path)
      === Seq((1, "writer-A"), (2, odd)))
    Generations.releaseClaim(spark, path, 2, odd)
    assert(Generations.listClaims(spark, path) === Seq((1, "writer-A")))
    prepared.unpersist()
  }

  test("FsIO.write is atomically visible: concurrent readers never " +
      "observe a partial or empty sidecar (r19 contention-bench find)") {
    spark.sparkContext // FsIO resolves filesystems off the active session
    val path = graft.VerifyIO.scratchDir("graft_fsio")
      .resolve("meta.json").toString
    // payloads long enough that a truncate-then-write window (the old
    // in-place create) would be observable as a prefix read
    def payload(tag: String) =
      s"""{"family":"$tag","generations":7,"pad":"${tag * 2048}"}"""
    val a = payload("a"); val b = payload("b")
    graft.core.FsIO.write(path, a)
    @volatile var stop = false
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val readers = (0 until 4).map(_ => new Thread(() => {
      while (!stop && bad.get == null) {
        val s = graft.core.FsIO.read(path)
        if (s != a && s != b) bad.set(s.take(120))
      }
    }))
    readers.foreach(_.start())
    (0 until 200).foreach(i =>
      graft.core.FsIO.write(path, if (i % 2 == 0) b else a))
    stop = true
    readers.foreach(_.join())
    assert(bad.get == null,
      s"a reader observed a non-committed sidecar state: '${bad.get}'")
    // and the final content is the last committed write, crc-free
    assert(graft.core.FsIO.read(path) === a)
  }

  test("atomic-create probe: s3a admitted by the ACTUAL path capability, " +
      "config flag alone refused, unknown schemes only by the blanket ack " +
      "(verdict r18 #7 + advice r19)") {
    // scheme + hasPathCapability are the only things the probe reads off
    // the FileSystem, so a local fs masquerading as s3a/s3n with a
    // controllable capability answer drives every real decision path
    def fsWith(s: String, cap: Boolean) =
      new org.apache.hadoop.fs.RawLocalFileSystem {
        override def getScheme: String = s
        override def hasPathCapability(p: org.apache.hadoop.fs.Path,
            c: String): Boolean =
          cap && c == Generations.s3aConditionalCreateKey
      }
    val conf = new org.apache.hadoop.conf.Configuration(false)
    // plain s3a: check-then-write, refused loudly, message names the fix
    val e1 = intercept[IllegalStateException] {
      Generations.ensureAtomicCreate(fsWith("s3a", cap = false), conf)
    }
    assert(e1.getMessage.contains(Generations.s3aConditionalCreateKey))
    // the CONFIG FLAG alone must not admit (advice r19): an s3a client
    // too old for HADOOP-19256 ignores the key silently — the probe
    // asks the filesystem, not the conf
    conf.setBoolean(Generations.s3aConditionalCreateKey, true)
    intercept[IllegalStateException] {
      Generations.ensureAtomicCreate(fsWith("s3a", cap = false), conf)
    }
    // the REAL capability (HADOOP-19256 conditional If-None-Match PUT)
    // admits s3a without the blanket ack, conf flag or not
    Generations.ensureAtomicCreate(fsWith("s3a", cap = true),
      new org.apache.hadoop.conf.Configuration(false))
    // the s3a capability must NOT leak admission to other schemes
    val e2 = intercept[IllegalStateException] {
      Generations.ensureAtomicCreate(fsWith("s3n", cap = true), conf)
    }
    assert(e2.getMessage.contains("s3n"))
    // the blanket ack still admits a store the operator has verified
    conf.setBoolean("graft.claims.atomic-create.ack", true)
    Generations.ensureAtomicCreate(fsWith("s3n", cap = false), conf)
    // known-atomic schemes never consult capability or flags
    Generations.ensureAtomicCreate(fsWith("file", cap = false),
      new org.apache.hadoop.conf.Configuration(false))
  }
}
