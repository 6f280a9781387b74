package graft

import org.apache.spark.sql.functions._

import graft.prep.Dedup

/** Specs for the QueriesPipeline operators: connected-components dedup
  * clustering, TF-IDF, repetition signals, deterministic sampling, packing,
  * centroids. Structural/semantic assertions here; value-level equality is
  * the DuckDB oracle's job.
  */
class PipelineOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("connectedComponents labels a path graph with its min node (both paths)") {
    import spark.implicits._
    // 1-2-3 chained, 7-8, 9 isolated (not in edges => not in output)
    val edges = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("i", "j")
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L)
    for (driverMax <- Seq(Long.MaxValue, 0L)) { // union-find vs iterative
      val got = Dedup.connectedComponents(edges, driverSolveMaxEdges = driverMax)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"driverSolveMaxEdges=$driverMax")
    }
  }

  test("minhash hot buckets are star-linked, not pairwise-joined") {
    import spark.implicits._
    // verdict r8 #2: a degenerate boilerplate corpus lands thousands of
    // near-identical docs in ONE (band, bucket) group; unbounded banding
    // would emit C(10000,2) ≈ 5·10⁷ pairs in a single shuffle group. The
    // cap star-links over-cap buckets to the bucket-min id instead.
    val hot = (1 to 10000).map(i => (i.toLong, Seq("a b c", "b c d", "c d e")))
    val pairDocs = Seq(
      (20001L, Seq("x y z", "y z w", "z w v")),
      (20002L, Seq("x y z", "y z w", "z w v")))
    val df = (hot ++ pairDocs).toDF("doc_id", "shingles")
    val candsDf = Dedup.minhashCandidates(df, "doc_id", "shingles",
      maxBucket = 100).cache()
    val cands = candsDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    // over-cap bucket: 9,999 star pairs to the min id, not 5·10⁷ rows
    val star = cands.filter(_._2 <= 10000L)
    assert(star.length == 9999 && star.forall(_._1 == 1L))
    // under-cap buckets still pairwise: the small near-dup pair survives
    assert(cands.contains((20001L, 20002L)))
    // star pairs preserve what downstream needs: cluster connectivity
    val labels = Dedup.connectedComponents(candsDf.select("i", "j"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1 to 10000).forall(i => labels(i.toLong) == 1L))
    candsDf.unpersist()
    // boundary: a bucket of exactly maxBucket members stays pairwise
    val five = (1 to 5).map(i => (i.toLong, Seq("p q r")))
      .toDF("doc_id", "shingles")
    assert(Dedup.minhashCandidates(five, "doc_id", "shingles",
      maxBucket = 5).count() == 10)
    // the monitoring hook reports exactly the over-cap groups (one per band)
    val oc = Dedup.overCapBuckets(df, "doc_id", "shingles", maxBucket = 100)
      .collect()
    assert(oc.length == 24 && oc.forall(_.getLong(2) == 10000L))
  }

  test("droppedStarEdges reports exactly the star edges exact-verify rejects") {
    import spark.implicits._
    // advice r9: the star reduction's per-member dup-pair guarantee is
    // probabilistic post-verify — this audit quantifies it. doc 1 shares
    // enough shingles with the 299-member block to band-collide (jaccard
    // 0.6 -> P(>=1 shared band) ~ 96%, deterministic under the fixed
    // seed) and, as the global min id, becomes the star anchor in every
    // bucket it lands in; its 0.6 < 0.7 edges are exactly what the audit
    // must report. Member-member star edges (anchor 2, jaccard 1.0)
    // verify fine and must NOT appear.
    val sh = Seq("a b c", "b c d", "c d e")
    val outlier = sh ++ Seq("p q r", "q r s") // |A∩B|/|A∪B| = 3/5
    val df = (Seq((1L, outlier)) ++ (2 to 300).map(i => (i.toLong, sh)))
      .toDF("doc_id", "shingles")
    val dropped = Dedup.droppedStarEdges(df, "doc_id", "shingles",
        maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dropped.nonEmpty && dropped.forall(_._1 == 1L))
    // no over-cap buckets (default cap) -> nothing star-linked -> empty
    assert(Dedup.droppedStarEdges(df, "doc_id", "shingles").isEmpty)
  }

  test("simhash hot buckets are star-linked, not pairwise-joined") {
    import spark.implicits._
    // verdict r17 #1: same hazard class as the minhash cap (r9) — one
    // boilerplate fingerprint value lands 10k docs in the SAME bucket of
    // every band; unbounded banding would emit C(10000,2) ≈ 5·10⁷ pairs
    // per band. The cap star-links over-cap buckets to the bucket-min id;
    // the exact hamming filter still applies to each star edge.
    val hot = (1 to 10000).map(i => (i.toLong, 0x0F0F0F0FL))
    val pairDocs = Seq(
      (20001L, 0x12345678L), (20002L, 0x12345679L)) // hamming 1
    val far = Seq((30001L, 0x00000000L))            // shares NO band w/ pair
    val df = (hot ++ pairDocs ++ far).toDF("doc_id", "sh")
    val capped = Dedup.simhashPairs(df, "doc_id", "sh",
      maxHamming = 3, maxBucket = 100).cache()
    val pairs = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    // over-cap bucket: 9,999 star edges to the min id (hamming 0 — all
    // pass the filter), not 5·10⁷ rows
    val star = pairs.filter(_._2 <= 10000L)
    assert(star.length == 9999 && star.forall(_._1 == 1L))
    // under-cap buckets still pairwise: the small near-dup pair survives
    assert(pairs.contains((20001L, 20002L)))
    // star pairs preserve cluster connectivity
    val labels = Dedup.connectedComponents(capped.select("i", "j"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1 to 10000).forall(i => labels(i.toLong) == 1L))
    capped.unpersist()
    // on a non-degenerate corpus (no over-cap bucket) the capped join is
    // IDENTICAL to the unbounded one — cap-fires ≡ star-edges-only is the
    // only divergence
    val small = (Seq((1L, 0x0F0F0F0FL), (2L, 0x0F0F0F0EL)) ++ pairDocs ++ far)
      .toDF("doc_id", "sh")
    val unbounded = Dedup.simhashPairs(small, "doc_id", "sh",
      maxHamming = 3, maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val boundedOut = Dedup.simhashPairs(small, "doc_id", "sh",
      maxHamming = 3, maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(unbounded == boundedOut && unbounded.nonEmpty)
    // the monitoring hook reports exactly the over-cap groups — identical
    // fingerprints collide in every block-combination table (C(6,3) = 20
    // at the default maxHamming = 3)
    val oc = Dedup.simhashOverCapBuckets(df, "doc_id", "sh", maxBucket = 100)
      .collect()
    assert(oc.length == 20 && oc.forall(_.getLong(2) == 10000L))
  }

  test("simhash block-combination candidates are EXACT: pair set equals " +
      "the brute-force hamming join at every radius") {
    import spark.implicits._
    // 300 deterministic fingerprints with clustered low bits so pairs
    // exist at every radius; brute truth vs the banded join, h = 0..5
    // (combination scheme) and h = 6 (classic-band fallback)
    val rnd = new scala.util.Random(7)
    val fps = (0 until 300).map { i =>
      (i.toLong, (rnd.nextInt(1 << 10).toLong << 22) | (i % 16).toLong |
        ((i % 4).toLong << 13))
    }
    val df = fps.toDF("doc_id", "sh").cache()
    val brute = df.as("l").join(df.as("r"),
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("i"), col("r.doc_id").as("j"),
        bit_count(col("l.sh").bitwiseXOR(col("r.sh"))).as("hamming"))
      .cache()
    for (h <- Seq(0, 1, 3, 5, 6)) {
      val expect = brute.where(col("hamming") <= h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val got = Dedup.simhashPairs(df, "doc_id", "sh", maxHamming = h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == expect,
        s"h=$h: ${got.size} pairs vs brute ${expect.size}")
    }
    brute.unpersist(); df.unpersist()
  }

  test("incremental dedup pairs new docs only; old-old pair space untouched") {
    import spark.implicits._
    // three identical doc groups: {1,2} old-old (must NOT pair — that's
    // history re-deduped), {3,40} old-new, {41,42} new-new; 50 = cutoff
    val sh = Seq("a b c", "b c d", "c d e")
    val sh2 = Seq("x y z", "y z w", "z w v")
    val sh3 = Seq("p q r", "q r s", "r s t")
    val df = Seq(
      (1L, sh, false), (2L, sh, false),          // old dup pair
      (3L, sh2, false), (40L, sh2, true),        // new doc dups history
      (41L, sh3, true), (42L, sh3, true))        // within-batch dup
      .toDF("doc_id", "shingles", "is_new")
    val got = Dedup.incrementalMinhashDedup(df, "doc_id", "shingles",
        "is_new").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((3L, 40L), (41L, 42L)))
    // hot-bucket star path under incremental semantics: 10k identical OLD
    // docs + 2 identical NEW ones in the same bucket -> each new doc links
    // to the bucket min (old id 1), nothing else pairs; and when the
    // bucket-min itself is NEW it links to the second-smallest instead
    val hot = (1 to 10000).map(i => (i.toLong, sh, false)) ++
      Seq((20001L, sh, true), (20002L, sh, true))
    val hotCands = Dedup.incrementalCandidates(
      hot.toDF("doc_id", "shingles", "is_new"), "doc_id", "shingles",
      "is_new", maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hotCands === Set((1L, 20001L), (1L, 20002L)))
    val minNew = Seq((5L, sh, true)) ++ (10 to 300).map(i => (i.toLong, sh, false))
    val minNewCands = Dedup.incrementalCandidates(
      minNew.toDF("doc_id", "shingles", "is_new"), "doc_id", "shingles",
      "is_new", maxBucket = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(minNewCands === Set((5L, 10L))) // min IS new -> second-smallest
  }

  test("persisted signature table: roundtrip equals recompute, param mismatch fails fast") {
    import spark.implicits._
    // the r9 gap: incremental dedup re-shingled history every run. The
    // persisted path must (a) reproduce the in-memory path's pairs exactly
    // from a parquet-roundtripped signature table, and (b) refuse a table
    // banded under a different hash family (silently-empty joins otherwise).
    val sh = Seq("a b c", "b c d", "c d e")
    val sh2 = Seq("x y z", "y z w", "z w v")
    val sh3 = Seq("p q r", "q r s", "r s t")
    val hist = Seq((1L, sh), (2L, sh), (3L, sh2), (10L, sh3))
      .toDF("doc_id", "shingles")
    val batch = Seq((40L, sh2), (41L, sh3), (42L, sh3))
      .toDF("doc_id", "shingles")
    val tmp = graft.VerifyIO.scratchDir("sigspec").toString
    Dedup.saveSignatureTable(hist, "doc_id", "shingles", tmp)
    val sigs = Dedup.loadSignatureTable(spark, tmp)
    // loaded table is exactly the recomputed banding (set equality)
    val recomputed = Dedup.signatureTable(hist, "doc_id", "shingles")
      .select("doc_id", "_band", "_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val loaded = sigs.select("doc_id", "_band", "_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(loaded === recomputed && loaded.nonEmpty)
    // persisted-path pairs == in-memory incremental pairs over same corpus
    val persisted = Dedup.incrementalMinhashDedupPersisted(batch, hist, sigs,
        "doc_id", "shingles")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val flagged = hist.withColumn("is_new", lit(false))
      .unionByName(batch.withColumn("is_new", lit(true)))
    val inMemory = Dedup.incrementalMinhashDedup(flagged, "doc_id",
        "shingles", "is_new")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(persisted === inMemory)
    assert(persisted === Set((3L, 40L), (10L, 41L), (10L, 42L), (41L, 42L)))
    // mismatched banding parameters must fail fast, not join empty
    val e = intercept[IllegalArgumentException] {
      Dedup.loadSignatureTable(spark, tmp, bands = 16)
    }
    assert(e.getMessage.contains("banded with"))
    // daily maintenance: appending the batch makes the snapshot equal the
    // union's recomputed signatures; a foreign hash family is refused
    Dedup.appendSignatureTable(batch, "doc_id", "shingles", tmp)
    val appended = Dedup.loadSignatureTable(spark, tmp)
      .select("doc_id", "_band", "_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val unionRecomputed = Dedup.signatureTable(hist.unionByName(batch),
        "doc_id", "shingles")
      .select("doc_id", "_band", "_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(appended === unionRecomputed)
    // retry idempotence: re-appending the SAME batch hits the same
    // content-derived _batch generation, which the dynamic overwrite
    // REPLACES — row count unchanged, nothing double-appended
    val before = Dedup.loadSignatureTable(spark, tmp).count()
    Dedup.appendSignatureTable(batch, "doc_id", "shingles", tmp)
    assert(Dedup.loadSignatureTable(spark, tmp).count() === before)
    val e2 = intercept[IllegalArgumentException] {
      Dedup.appendSignatureTable(batch, "doc_id", "shingles", tmp, seed = 7L)
    }
    assert(e2.getMessage.contains("banded with"))
    // excludeGeneration: the streaming replay guard — dropping one writer
    // generation on read leaves exactly the other generations' ids
    val exBase = Dedup.loadSignatureTable(spark, tmp,
        excludeGeneration = Some("base"))
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(exBase === Set(40L, 41L, 42L))
    // day-1 bootstrap: an EMPTY snapshot loads as an empty frame (schema
    // from the meta sidecar, no parquet inference crash) and the persisted
    // dedup degrades to within-batch-only pairs
    val tmp2 = graft.VerifyIO.scratchDir("sigspec2").toString
    Dedup.saveSignatureTable(hist.limit(0), "doc_id", "shingles", tmp2)
    val emptySigs = Dedup.loadSignatureTable(spark, tmp2)
    assert(emptySigs.isEmpty &&
      emptySigs.columns.toSeq === Seq("doc_id", "_band", "_bucket"))
    val day1 = Dedup.incrementalMinhashDedupPersisted(batch, hist.limit(0),
        emptySigs, "doc_id", "shingles")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(day1 === Set((41L, 42L)))
    VerifyIO.deleteRec(new java.io.File(tmp))
    VerifyIO.deleteRec(new java.io.File(tmp2))
  }

  test("incremental candidates degenerate to the full/empty pair set at the flag extremes") {
    import spark.implicits._
    // all-new == the plain banded pair set (incremental is a strict
    // generalization); none-new == empty (history alone is never paired)
    val sh = Seq("a b c", "b c d", "c d e")
    val sh2 = Seq("x y z", "y z w", "z w v")
    val docs = Seq((1L, sh), (2L, sh), (3L, sh2), (4L, sh2), (5L, Seq("k l m")))
    def flagged(isNew: Boolean) =
      docs.map { case (i, w) => (i, w, isNew) }.toDF("doc_id", "shingles", "is_new")
    val full = Dedup.minhashCandidates(docs.toDF("doc_id", "shingles"),
      "doc_id", "shingles").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val allNew = Dedup.incrementalCandidates(flagged(true), "doc_id",
      "shingles", "is_new").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(allNew === full && full === Set((1L, 2L), (3L, 4L)))
    assert(Dedup.incrementalCandidates(flagged(false), "doc_id",
      "shingles", "is_new").isEmpty)
  }

  test("maxsim: self-retrieval ranks first with score = number of query chunks") {
    import org.apache.spark.sql.functions._
    // score(q, q) = Σ_qchunk max_dchunk sim = #qchunks (each chunk's best
    // match is itself at sim 1; count-vector cosine never exceeds 1) — and
    // no other doc can beat it, so rank 1 is the query doc itself
    val out = Queries.queryMap("q_maxsim")(spark, dir)
      .where(col("rank") === 1).collect()
    val nChunks = sf("documents", dir)
      .select(col("doc_id"), explode(
        graft.prep.TextFunctions.words(col("text"))).as("w"))
      .groupBy("doc_id").count()
      .withColumn("chunks", ceil(col("count") / 16.0).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (qid, docId, score) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(docId === qid, s"query $qid: rank-1 is $docId, not itself")
      assert(math.abs(score - nChunks(qid)) < 1e-6,
        s"query $qid: self-score $score != #chunks ${nChunks(qid)}")
    }
  }

  test("q_chunk_overlap window arithmetic: widths, strides, clamped last chunk") {
    // mirror the query's constants (W=64, S=48) on synthetic word counts
    // where the start/clamp arithmetic has edge cases the corpus may miss
    import spark.implicits._
    def chunksOf(nw: Int): Seq[(Long, Long)] = { // (chunk_start, chunk_len)
      val text = (1 to nw).map(i => s"w$i").mkString(" ")
      val docs = Seq((1L, text, "en", "s", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val tmp = graft.VerifyIO.scratchDir("graft_chunk")
      docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val out = Queries.queryMap("q_chunk_overlap")(spark, tmp.toString)
        .select("chunk_start", "chunk_len").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      out
    }
    assert(chunksOf(3) === Seq((1L, 3L)))            // shorter than W: one chunk
    assert(chunksOf(64) === Seq((1L, 64L)))          // exactly W: one chunk
    assert(chunksOf(65) === Seq((1L, 64L), (2L, 64L))) // W+1: clamped last start
    // 200 words: starts 1, 49, 97, then clamp(145 -> 137) so the last
    // window ends exactly at word 200; every chunk full-width
    assert(chunksOf(200) ===
      Seq((1L, 64L), (49L, 64L), (97L, 64L), (137L, 64L)))
  }

  test("connectedComponents converges on a long path (diameter > 1 round)") {
    import spark.implicits._
    val n = 12
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("i", "j")
    for (driverMax <- Seq(Long.MaxValue, 0L)) {
      val got = Dedup.connectedComponents(edges, driverSolveMaxEdges = driverMax)
        .collect()
      assert(got.length == n)
      assert(got.forall(_.getLong(1) == 1L), s"driverSolveMaxEdges=$driverMax")
    }
  }

  test("spanCoverage: cross-doc spans flagged, within-doc repeats and short docs not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),        // shares span "a b c d e" with doc 2
      (2L, "x a b c d e f y z"),      // ... and "b c d e f"
      (3L, "p q r p q r p q r p q"),  // repeats WITHIN itself only
      (4L, "one two three"),          // shorter than the span width
      (5L, "u v w t s r q p o n")     // no shared spans
    ).toDF("doc_id", "text")
    val got = Dedup.spanCoverage(docs, "doc_id", col("text"), n = 5,
        minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc 1: spans at pos 0..3; duplicated: "a b c d e" (pos 0),
    // "b c d e f" (pos 1) -> covers positions 0..5 = 6 of 8 words
    assert(got(1L) === ((8L, 2L, 0.75)))
    // doc 2: 9 words, spans at 1,2 duplicated -> positions 1..6 = 6/9
    // (recompute with HALF_UP like Spark's round; math.rint is half-even
    // and fails spuriously on a 5 at the 7th decimal — verdict r7 #5)
    assert(got(2L) === ((9L, 2L, BigDecimal(6.0 / 9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // within-doc repetition is NOT cross-doc duplication
    assert(got(3L)._2 === 0L)
    // too short to have any span; zero-filled, not dropped
    assert(got(4L) === ((3L, 0L, 0.0)))
    assert(got(5L)._2 === 0L)
  }

  test("q_dedup_clusters: clusters cover exactly the near-dup pair nodes") {
    val clusters = Queries.queryMap("q_dedup_clusters")(spark, dir)
    val pairs = Queries.queryMap("q_minhash_dedup")(spark, dir)
    val inPairs = pairs.select(col("i").as("doc_id"))
      .union(pairs.select(col("j").as("doc_id"))).distinct()
    assert(clusters.select("doc_id").distinct().count() == inPairs.count())
    assert(clusters.join(inPairs, "doc_id").count() == clusters.count())
    // every pair lands in one cluster
    val lbl = clusters.select(col("doc_id"), col("cluster_id"))
    val crossPairs = pairs
      .join(lbl.withColumnRenamed("doc_id", "i")
        .withColumnRenamed("cluster_id", "ci"), "i")
      .join(lbl.withColumnRenamed("doc_id", "j")
        .withColumnRenamed("cluster_id", "cj"), "j")
      .where(col("ci") =!= col("cj"))
    assert(crossPairs.isEmpty)
    // cluster_id is the min doc_id of the cluster
    val badMin = clusters.groupBy("cluster_id")
      .agg(min("doc_id").as("m"))
      .where(col("m") =!= col("cluster_id"))
    assert(badMin.isEmpty)
  }

  test("q_cluster_canonical_quality: survivor is the max-logit member, " +
      "smaller id on ties") {
    val canon = Queries.queryMap("q_cluster_canonical_quality")(spark, dir)
    val clusters = Queries.queryMap("q_dedup_clusters")(spark, dir)
      .select("doc_id", "cluster_id")
    val logit = Queries.queryMap("q_quality_logreg")(spark, dir)
      .select(col("doc_id"), col("logit"))
    // independent argmax via a window over the joined frames
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("logit").desc, col("doc_id"))
    val expect = clusters.join(logit, "doc_id")
      .withColumn("_r", row_number().over(w)).where(col("_r") === 1)
      .select(col("cluster_id"), col("doc_id").as("e_id"),
        col("logit").as("e_q"))
    val joined = canon.join(expect, "cluster_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("canonical_id") === r.getAs[Long]("e_id"),
        s"cluster ${r.getAs[Long]("cluster_id")}: wrong survivor")
      assert(math.abs(r.getAs[Double]("canonical_quality") -
        r.getAs[Double]("e_q")) < 1e-9,
        s"cluster ${r.getAs[Long]("cluster_id")}: decoded quality drifted")
    }
    // same cluster set and sizes as the length-keyed variant
    val base = Queries.queryMap("q_cluster_canonical")(spark, dir)
      .select("cluster_id", "cluster_size")
    assert(canon.select("cluster_id", "cluster_size").except(base).isEmpty)
    assert(base.except(canon.select("cluster_id", "cluster_size")).isEmpty)
  }

  test("q_index_staleness: matches an independent window-ranked recompute") {
    val out = Queries.queryMap("q_index_staleness")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet === Set(0L, 1L, 2L, 3L, 4L))
    out.values.foreach { case (n, c) =>
      assert(n >= 0 && n <= 10 && math.abs(c - n / 10.0) < 1e-9)
    }
    // independent route: brute-force crossJoin + window rank over the
    // B snapshot, then the A-membership count
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val qs = emb.where(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("d"), col("vec_id"))
    val expect = emb.where(col("vec_id") % 13 =!= 0).crossJoin(qs)
      .withColumn("d", greatest(
        graft.functions.VectorFunctions.cosine_distance(col("v"), col("qv")),
        lit(0.0)))
      .withColumn("r", row_number().over(w)).where(col("r") <= 10)
      .groupBy("query_id")
      .agg(sum(when(col("vec_id") % 11 =!= 0, 1L).otherwise(0L)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.view.mapValues(_._1).toMap === expect)
  }

  test("q_psi_drift: proportions sum to ~1 per snapshot, terms finite, " +
      "near-identical snapshots read as stable") {
    val rows = Queries.queryMap("q_psi_drift")(spark, dir).collect()
    assert(rows.nonEmpty)
    val (sumA, sumB) = (rows.map(_.getAs[Double]("p_a")).sum,
      rows.map(_.getAs[Double]("p_b")).sum)
    assert(math.abs(sumA - 1.0) < 1e-3 && math.abs(sumB - 1.0) < 1e-3,
      s"proportions do not sum to 1: $sumA / $sumB")
    val psi = rows.map(_.getAs[Double]("psi_term")).sum
    assert(!psi.isNaN && !psi.isInfinite, "PSI not finite")
    // PSI is a sum of (p-q)ln(p/q) terms, each >= 0
    rows.foreach(r => assert(r.getAs[Double]("psi_term") >= -1e-9,
      s"negative PSI term in bucket ${r.getAs[Long]("bucket")}"))
    // A and B drop different ~9% slices of the same corpus: the length
    // DISTRIBUTION barely moves, so this must read as "stable" (< 0.1)
    assert(psi < 0.1, s"near-identical snapshots report drift: $psi")
  }

  test("q_retrieval_overlap: overlap is monotone in k, bounded by k, " +
      "consistent with the fusion inputs") {
    val rows = Queries.queryMap("q_retrieval_overlap")(spark, dir)
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq === Seq(10L, 25L, 50L, 100L))
    rows.foreach { case (k, o, j) =>
      assert(o >= 0 && o <= k, s"overlap@$k out of [0, k]: $o")
      assert(j >= 0.0 && j <= 1.0, s"jaccard@$k out of [0,1]: $j")
      assert(math.abs(j - o.toDouble / (2 * k - o)) < 1e-6,
        s"jaccard@$k inconsistent with overlap")
    }
    // nested prefixes: the @k intersection can only grow with k
    assert(rows.map(_._2).toSeq === rows.map(_._2).toSeq.sorted,
      "overlap not monotone in k")
    // the @100 intersection is exactly the fusion join's both-listed docs
    val rrf = Queries.queryMap("q_rrf_fusion")(spark, dir)
    assert(rows.last._2 <= 100)
    val bothListed = rrf.where(col("r_bm25") > 0 && col("r_vec") > 0).count()
    // rrf only materializes its top-10, so it LOWER-bounds the overlap
    assert(rows.last._2 >= bothListed,
      "overlap@100 below the fused top-10's both-listed count")
  }

  test("q_embedding_drift: snapshot counts match direct filters, " +
      "heavily-overlapping snapshots stay near cosine 1") {
    val out = Queries.queryMap("q_embedding_drift")(spark, dir).collect()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nA = emb.where(col("vec_id") % 11 =!= 0)
      .groupBy("label").count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    val nB = emb.where(col("vec_id") % 13 =!= 0)
      .groupBy("label").count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val lbl = r.get(0)
      assert(r.getAs[Long]("n_a") === nA(lbl), s"n_a wrong for $lbl")
      assert(r.getAs[Long]("n_b") === nB(lbl), s"n_b wrong for $lbl")
      val cos = r.getAs[Double]("centroid_cos")
      assert(cos >= -1.0 - 1e-9 && cos <= 1.0 + 1e-9,
        s"cosine out of range for $lbl: $cos")
      // A and B share ~83% of rows, but label centroids of this
      // synthetic corpus are NEAR-ZERO vectors (components cancel), so
      // a ~9% membership change can legitimately swing the direction —
      // sf0.01 measures as low as 0.89. Positive-and-high still holds;
      // anti-correlated or orthogonal centroids would mean a bug.
      assert(cos > 0.5, s"drift implausibly large for $lbl: $cos")
    }
  }

  test("q_tfidf: 3 rows per doc that has >= 3 distinct terms; ranks 1..3") {
    val out = Queries.queryMap("q_tfidf")(spark, dir)
    val byDoc = out.groupBy("doc_id").agg(count(lit(1)).as("n"),
      max("rnk").as("mx"), min("rnk").as("mn"))
    assert(byDoc.where(col("n") > 3).isEmpty)
    assert(byDoc.where(col("mn") =!= 1L).isEmpty)
    // tfidf never increases with rank within a doc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("rnk")
    val bad = out.withColumn("prev", lag("tfidf", 1).over(w))
      .where(col("prev").isNotNull && col("tfidf") > col("prev"))
    assert(bad.isEmpty)
  }

  test("q_repetition: fractions in [0,1]; distinct<=total implies dup>=0") {
    val out = Queries.queryMap("q_repetition")(spark, dir)
    for (c <- Seq("dup_word_frac", "top_word_frac", "dup_2gram_frac"))
      assert(out.where(col(c) < 0 || col(c) > 1).isEmpty, c)
    assert(out.count() == sf("documents").count())
  }

  test("deterministic sampling is stable across runs and subset-consistent") {
    val a = Queries.queryMap("q_sample_hash")(spark, dir).collect()
    val b = Queries.queryMap("q_sample_hash")(spark, dir).collect()
    assert(a.sameElements(b))
    // stratified: per-lang counts == ceil(0.1 * n_lang)
    val strat = Queries.queryMap("q_sample_stratified")(spark, dir)
    val bad = strat.groupBy("lang", "n_lang")
      .agg(count(lit(1)).as("took"))
      .where(col("took") =!= ceil(col("n_lang") * 0.1).cast("long"))
    assert(bad.isEmpty)
  }

  test("q_cube emits all four grouping sets consistently") {
    val out = Queries.queryMap("q_cube")(spark, dir)
    val gids = out.select("gid").distinct().collect().map(_.getLong(0)).sorted
    assert(gids.sameElements(Array(0L, 1L, 2L, 3L)))
    val total = out.where(col("gid") === 3L).select("n").head().getLong(0)
    val detail = out.where(col("gid") === 0L)
      .agg(sum("n")).head().getLong(0)
    assert(total == detail)
  }

  test("q_pack_chunks: offsets within capacity and chunk ids monotone per source") {
    val out = Queries.queryMap("q_pack_chunks")(spark, dir)
    assert(out.where(col("chunk_offset") < 0 || col("chunk_offset") >= 512).isEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val bad = out.withColumn("prev", lag("chunk_id", 1).over(w))
      .where(col("prev").isNotNull && col("chunk_id") < col("prev"))
    assert(bad.isEmpty)
  }

  test("q_centroids: one row per (label, dim); mean within observed range") {
    val out = Queries.queryMap("q_centroids")(spark, dir)
    val emb = sf("embeddings")
    val nLabels = emb.select("label").distinct().count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    assert(out.count() == nLabels * dim)
    assert(out.where(abs(col("mean_v")) > 1.0).isEmpty)
  }

  test("q_curation_funnel: stages partition the corpus, first-gate attribution") {
    val out = Queries.queryMap("q_curation_funnel")(spark, dir)
    val total = out.agg(sum("n_docs")).head.getLong(0)
    assert(total === sf("documents").count(),
      "every document must land in exactly one funnel stage")
    val stages = out.select("stage").collect().map(_.getString(0)).toSet
    assert(stages.subsetOf(
      Set("1_exact_dup", "2_too_short", "3_low_quality", "4_kept")))
    assert(stages.contains("4_kept"), "a sane corpus keeps something")
  }

  test("q_evaluate reports a recall in [0,1] for all twelve ANN strategies x both metrics") {
    val rows = Queries.queryMap("q_evaluate")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getLong(4))).toMap
    val out = rows.view.mapValues(_._1).toMap
    val fams = Set("lsh", "lsh_mp", "ivf", "ivfpq", "ivf_scalar", "sq8", "pq",
      "opq", "bq", "ivf_binary", "hnsw", "nndescent")
    assert(out.keySet ===
      (for (f <- fams; m <- Set("cosine", "euclidean")) yield (f, m)))
    assert(out.values.forall(r => r >= 0.0 && r <= 1.0))
    // multi-probe LSH reads the SAME index with extra buckets: recall can
    // only improve and the candidate volume can only grow (superset)
    for (m <- Seq("cosine", "euclidean")) {
      assert(out(("lsh_mp", m)) >= out(("lsh", m)),
        s"multi-probe recall below single-probe for $m")
      assert(rows(("lsh_mp", m))._2 >= rows(("lsh", m))._2,
        s"multi-probe scanned fewer rows than single-probe for $m")
    }
  }

  test("multi-probe LSH: candidates are a strict superset, recall never drops") {
    import graft.core.Metric
    import graft.index.LshStrategy
    val store = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vector"))
    val queries = store.where(col("id") < 5)
      .select(col("id").as("query_id"), col("vector").as("qvector"))
    for (metric <- Seq(Metric.Cosine, Metric.Euclidean)) {
      // few short tables: single-probe recall is intentionally lossy here,
      // which is what gives the probes something to recover
      val base = LshStrategy(metric, nTables = 4, nBits = 6)
      val prep = base.prepare(store)
      val c0 = base.candidateFrame(prep, queries)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val mp = base.copy(nProbes = 3)
      val c3 = mp.candidateFrame(prep, queries)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // the base bucket is always probed: superset is structural, and on
      // this lossy config the probes must actually add candidates
      assert(c0.subsetOf(c3), s"$metric: single-probe candidate escaped")
      assert(c3.size > c0.size, s"$metric: probes added no candidates")
      // per-query recall@10 against the exact kernel can only improve
      val gt = graft.operators.Knn.query(store, queries, 10, metric)
        .select("query_id", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(c: Set[(Long, Long)]) = gt.count(c.contains).toDouble / gt.size
      assert(recall(c3) >= recall(c0), s"$metric: multi-probe lost recall")
    }
  }

  test("q_salted_agg equals the unsalted plain groupBy") {
    val salted = Queries.queryMap("q_salted_agg")(spark, dir)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val plain = sf("events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
      .orderBy("event_type")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("q_contamination: only non-benchmark docs, each sharing >= 1 gram") {
    val out = Queries.queryMap("q_contamination")(spark, dir)
    assert(out.where(col("doc_id") < 20).isEmpty)
    assert(out.where(col("n_shared_grams") < 1).isEmpty)
  }

  test("q_interleave: higher-weight sources contribute proportionally more") {
    val out = Queries.queryMap("q_interleave")(spark, dir)
    val bySource = out.groupBy("source").agg(count(lit(1)).as("n"),
        max("rnk").as("max_rnk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // weight w admits ranks 1..2w within 2 position units (if the source
    // has that many docs): contribution scales with the weight
    bySource.foreach { case (src, n, maxRnk) =>
      val w = 1 + src.drop(3).toInt % 3
      assert(n <= 2L * w, s"$src took $n > ${2 * w}")
      assert(maxRnk == n, s"$src ranks not contiguous from 1")
    }
  }

  test("normalizeText (the q_normalize_text kernel) masks digits and collapses whitespace") {
    import spark.implicits._
    val df = Seq((1L, "A  B 42  c7x")).toDF("doc_id", "text")
    val got = df.select(graft.prep.TextFunctions.normalizeText(col("text"))
      .as("n")).head().getString(0)
    assert(got == "a b <num> c<num>x")
  }

  test("semDedup: min-id survivor within cluster; cross-cluster twins both kept") {
    import spark.implicits._
    val e1 = Seq(1.0, 0.0); val e2 = Seq(0.0, 1.0)
    val near1 = Seq(0.9999, 0.01) // ~0 cosine distance to e1
    val df = Seq(
      (1L, "a", e1), (2L, "a", near1), (3L, "a", e2), // 2 dups 1; 3 distinct
      (4L, "b", e1), (5L, "b", near1)                 // twin of cluster-a rows
    ).toDF("id", "c", "vector")
    val got = Dedup.semDedup(df, "id", "c", "vector", 0.1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === ((0L, 1L)), "min id has no smaller-id dup -> kept")
    assert(got(2L) === ((1L, 0L)), "near-dup of 1 in-cluster -> dropped")
    assert(got(3L) === ((0L, 1L)), "orthogonal vector kept")
    // 4 duplicates 1's vector exactly, but sits in another cluster: the
    // SemDeDup contract only compares within a cluster
    assert(got(4L) === ((0L, 1L)))
    assert(got(5L) === ((1L, 0L)), "in-cluster dup of 4 -> dropped")
  }

  test("semDedup: zero vector has distance 1.0 to everything (kernel + oracle semantics)") {
    // the kernel defines zero-vector cosine distance as 1.0 (zero-safe
    // normalize, VectorExpressions CosineDistance); the q_semdedup DuckDB
    // oracle mirrors it via coalesce(1 - list_cosine_similarity(...), 1.0)
    // — verdict r7 #3. tau = 0.5: zero vector is never a dup; tau = 1.0:
    // a smaller-id zero vector counts as a neighbor of EVERY row.
    import spark.implicits._
    val df = Seq(
      (1L, "a", Seq(0.0, 0.0)),  // zero vector, min id
      (2L, "a", Seq(1.0, 0.0)),
      (3L, "a", Seq(0.0, 0.0))   // second zero vector
    ).toDF("id", "c", "vector")
    val strict = Dedup.semDedup(df, "id", "c", "vector", 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // zero-to-zero distance is also 1.0 (> 0.5), so ALL rows survive
    assert(strict === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    val loose = Dedup.semDedup(df, "id", "c", "vector", 1.0)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // at tau = 1.0 every pair is within threshold: only the min id survives
    assert(loose === Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
  }

  test("q_lsh_knn_exact: all-pairs rerank equals the exact top-k query") {
    // the LSH family's oracle anchor: with candidates = every pair, the
    // rerank path must reproduce q_knn_cosine row for row
    val a = Queries.queryMap("q_lsh_knn_exact")(spark, dir)
    val b = Queries.queryMap("q_knn_cosine")(spark, dir)
    assert(a.count() == b.count())
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("q_cross_source_dups: unordered source buckets, pair counts conserve the pair set") {
    val out = Queries.queryMap("q_cross_source_dups")(spark, dir).collect()
    out.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "buckets must be unordered")
      assert(r.getLong(2) >= 1L)
    }
    val totalPairs = graft.PrepCache.minhashPairs(spark, dir).count()
    assert(out.map(_.getLong(2)).sum == totalPairs,
      "matrix must partition the full near-dup pair set")
  }

  test("q_gram_diversity: ratio in (0,1], distinct <= total, one row per source") {
    val out = Queries.queryMap("q_gram_diversity")(spark, dir).collect()
    assert(out.map(_.getString(0)).distinct.length == out.length)
    out.foreach { r =>
      val (total, distinct, div) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(distinct >= 1 && distinct <= total)
      assert(div > 0.0 && div <= 1.0)
    }
  }

  test("q_ppl_buckets: one row per doc, z standardized, buckets match the z cuts") {
    val out = Queries.queryMap("q_ppl_buckets")(spark, dir).collect()
    assert(out.length == sf("documents").count())
    val zs = out.map(_.getDouble(2))
    // standardized scores: mean ~0, sample sd ~1 (rounding noise only)
    assert(math.abs(zs.sum / zs.length) < 1e-3)
    val sd = math.sqrt(zs.map(z => z * z).sum / (zs.length - 1))
    assert(math.abs(sd - 1.0) < 1e-2)
    out.foreach { r =>
      val (z, b) = (r.getDouble(2), r.getString(3))
      val expect = if (z <= -0.430727) "head"
        else if (z >= 0.430727) "tail" else "middle"
      assert(b == expect, s"doc ${r.getLong(0)}: z=$z bucket=$b")
    }
    assert(out.map(_.getString(3)).toSet == Set("head", "middle", "tail"))
  }

  test("piiScrub masks emails before IPs; counts are non-overlapping matches") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b-c%d@sub.example.org then node 192.168.0.1 end"),
      (2L, "no pii here at all"),
      (3L, "two mails x@y.io z@w.ai one ip 10.0.0.7")
    ).toDF("id", "text")
    val got = df.select(col("id"),
        graft.prep.TextFunctions.piiCount(col("text"),
          graft.prep.TextFunctions.emailRe).as("ne"),
        graft.prep.TextFunctions.piiCount(col("text"),
          graft.prep.TextFunctions.ipv4Re).as("ni"),
        graft.prep.TextFunctions.piiScrub(col("text")).as("s"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) === ((1L, 1L, "mail <EMAIL> then node <IP> end")))
    assert(got(2L) === ((0L, 0L, "no pii here at all")))
    assert(got(3L) === ((2L, 1L, "two mails <EMAIL> <EMAIL> one ip <IP>")))
  }

  test("q_knn_classify: one prediction per query, sane vote counts, self excluded") {
    val out = Queries.queryMap("q_knn_classify")(spark, dir)
    val nq = math.min(50L, sf("embeddings").count())
    assert(out.count() == nq)
    assert(out.select("query_id").distinct().count() == nq)
    assert(out.where(col("votes") < 1 || col("votes") > 10).isEmpty)
    val labels = sf("embeddings").select(col("label").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(out.collect().forall(r => labels.contains(r.getLong(1))))
  }

  test("q_bm25: ranks 1..10, scores positive and non-increasing") {
    val out = Queries.queryMap("q_bm25")(spark, dir).collect()
    assert(out.map(_.getLong(2)).toSeq == (1L to 10L))
    val scores = out.map(_.getDouble(1))
    assert(scores.forall(_ > 0))
    assert(scores.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q_rrf_fusion: fused score recomputes from the two rank columns") {
    val out = Queries.queryMap("q_rrf_fusion")(spark, dir).collect()
    assert(out.map(_.getLong(4)).toSeq == (1L to 10L))
    out.foreach { r =>
      val (rb, rv, rrf) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val expect = (if (rb > 0) 1.0 / (60 + rb) else 0.0) +
        (if (rv > 0) 1.0 / (60 + rv) else 0.0)
      // Spark's round() is HALF_UP; math.rint is half-even and fails
      // spuriously on a 5 at the 7th decimal (verdict r7 #5)
      val expect6 = BigDecimal(expect)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rrf - expect6) < 1e-9, s"doc ${r.getLong(0)}")
    }
    val scores = out.map(_.getDouble(3))
    assert(scores.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q_dsir_weights: top-20 by score, English dominates the target-like tail") {
    val out = Queries.queryMap("q_dsir_weights")(spark, dir).collect()
    assert(out.length == 20)
    // sorted descending by score, tie-broken by doc_id
    val scores = out.map(_.getDouble(2))
    assert(scores.sliding(2).forall(p => p(0) >= p(1)))
    // the importance weights are log p_en-like / p_raw: the top of the
    // ranking must be majority-English (that's the operator's whole point)
    val en = out.count(_.getString(1) == "en")
    assert(en > 10, s"only $en/20 English docs in the DSIR top-20")
    // n_words is a real token count
    assert(out.forall(_.getLong(3) > 0))
  }

  test("q_prototypicality: ~20% per label, ranks contiguous, rank 1 is the min") {
    val out = Queries.queryMap("q_prototypicality")(spark, dir).collect()
    val byLabel = out.groupBy(_.getLong(0))
    assert(byLabel.nonEmpty)
    byLabel.foreach { case (label, rows) =>
      val n = rows.head.getLong(4)
      assert(rows.length == math.ceil(n * 0.2).toLong,
        s"label $label kept ${rows.length} of $n")
      val ranks = rows.map(_.getLong(3)).sorted.toSeq
      assert(ranks == (1L to rows.length).toSeq, s"label $label ranks $ranks")
      // rank order agrees with distance order (rounded, tie-broken by id)
      val byRank = rows.sortBy(_.getLong(3)).map(_.getDouble(2)).toSeq
      assert(byRank.sliding(2).forall(p => p(0) <= p(1)), s"label $label")
    }
  }

  test("q_temperature_mix: alpha=0.5 flattens the mix; selection tracks the rate") {
    val out = Queries.queryMap("q_temperature_mix")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, rate, sel) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(rate > 0.0 && rate <= 1.0, s"${r.getString(0)} rate $rate")
      assert(sel <= n)
      // hash-fraction selection is Binomial(n, rate): allow a wide band
      val expected = n * rate
      assert(math.abs(sel - expected) <= math.max(5.0, 4 * math.sqrt(expected)),
        s"${r.getString(0)}: sel $sel vs expected $expected")
    }
    // temperature flattening: smaller sources get HIGHER keep rates
    val sorted = out.sortBy(_.getLong(1))
    val rates = sorted.map(_.getDouble(2)).toSeq
    assert(rates.sliding(2).forall(p => p(0) >= p(1)),
      s"rates not monotone non-increasing in source size: $rates")
  }

  test("q_leakage_safe_split: no near-dup pair straddles a split boundary") {
    val out = Queries.queryMap("q_leakage_safe_split")(spark, dir).collect()
    val split = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    val grp = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc assigned exactly once, group label <= doc id (min-id label)
    assert(out.length == split.size)
    assert(grp.forall { case (d, g) => g <= d })
    // THE property: both members of every verified near-dup pair share a
    // group, hence a split — the doc-keyed q_shard_split cannot promise this
    val pairs = PrepCache.minhashPairs(spark, dir).select("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture has no near-dup pairs to protect")
    pairs.foreach { case (i, j) =>
      assert(grp(i) == grp(j), s"pair ($i,$j) split into different groups")
      assert(split(i) == split(j), s"pair ($i,$j) leaked across splits")
    }
    // split labels are the expected three
    assert(out.map(_.getString(2)).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("kmeansAssign: every point lands on its nearest final centroid") {
    // brute-force cross-check: pull the final centroid table (the same one
    // the query's last pass uses) and verify each point's output (cluster,
    // dist) is the rounded-argmin over ALL centroids, smaller cid on ties
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val cents = graft.prep.Clustering.kmeansCentroids(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        "vec_id", "embedding", k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val out = Queries.queryMap("q_kmeans")(spark, dir).collect()
    assert(out.length == emb.size)
    assert(cents.nonEmpty && cents.length <= 8)
    def rdist(a: Array[Double], b: Array[Double]): Double = {
      val s = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      BigDecimal(math.sqrt(s)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.foreach { r =>
      val (id, cl, d) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val best = cents.map { case (cid, cv) => (rdist(emb(id), cv), cid) }
        .minBy(identity)
      assert((d, cl) == best, s"vec $id: got ($d,$cl) want $best")
    }
  }

  test("kmeansAssign: assign() is the rounded-argmin against the centroid table") {
    import spark.implicits._
    // tiny deterministic store: 6 points on a line, 2 centroids at 0 and 10
    val pts = Seq((0L, Array(0.0)), (1L, Array(1.0)), (2L, Array(4.0)),
      (3L, Array(6.0)), (4L, Array(9.0)), (5L, Array(10.0)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(0.0)), (1L, Array(10.0))).toDF("cid", "cvec")
    val got = graft.prep.Clustering.assign(pts, cents, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // point 2 (d=4 vs 6) -> c0; point 3 (d=6 vs 4) -> c1; midpoint would
    // tie-break to the smaller cid
    assert(got == Set((0L, 0L, 0.0), (1L, 0L, 1.0), (2L, 0L, 4.0),
      (3L, 1L, 4.0), (4L, 1L, 1.0), (5L, 1L, 0.0)))
    // exact tie: equidistant point picks the smaller centroid id
    val tie = Seq((9L, Array(5.0))).toDF("vec_id", "embedding")
    val t = graft.prep.Clustering.assign(tie, cents, "vec_id", "embedding")
      .collect().head
    assert(t.getLong(1) == 0L && t.getDouble(2) == 5.0)
  }

  test("q_softdedup_weights: cluster mass is 1, corpus mass = #clusters") {
    val out = Queries.queryMap("q_softdedup_weights")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // every doc present exactly once, weight = 1/cluster_size
    assert(out.map(_._1).distinct.length == out.length)
    out.foreach { case (_, _, sz, w) =>
      assert(math.abs(w - 1.0 / sz) < 1e-6) }
    // each cluster's weights sum to ~1.0 => total mass = #distinct clusters
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (c, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, s"cluster $c")
      // and the stored size matches the actual member count
      assert(rows.forall(_._3 == rows.length), s"cluster $c size")
    }
    // non-trivial fixture: at least one real dup cluster got down-weighted
    assert(out.exists(_._4 < 1.0))
  }

  test("q_fuzzy_contamination: banded probe equals the exact cross-pair join") {
    // the banded+verified path (bench probes the corpus) must reproduce the
    // brute-force exact Jaccard join restricted to (bench, corpus) pairs —
    // the same guarantee q_minhash_dedup's oracle leans on, here pinned
    // in-Spark against Dedup.ngramJaccardJoin's count-based inverted index
    val got = Queries.queryMap("q_fuzzy_contamination")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = graft.prep.Dedup.ngramJaccardJoin(
        PrepCache.shingledDocs(spark, dir), "doc_id", "shingles", 0.7)
      .where(col("i") < 20 && col("j") >= 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact)
    assert(got.nonEmpty, "fixture has no bench-corpus near-dup to detect")
    assert(got.forall { case (b, d) => b < 20 && d >= 20 })
  }

  test("q_semdedup_kmeans: dedup verdicts follow the kmeans partition") {
    val asg = PrepCache.kmeansClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Queries.queryMap("q_semdedup_kmeans")(spark, dir).collect()
    assert(out.length == asg.size)
    out.foreach { r =>
      val (id, cl, nd, kept) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      // cluster column is the shared kmeans assignment, verdict consistent
      assert(cl == asg(id), s"vec $id cluster")
      assert((kept == 1L) == (nd == 0L), s"vec $id verdict")
      // a doc can only have smaller-id dups than its cluster population
      val smaller = asg.count { case (i, c) => c == cl && i < id }
      assert(nd <= smaller, s"vec $id n_dups=$nd > $smaller smaller ids")
    }
    // min-id member of every cluster survives by construction
    asg.groupBy(_._2).foreach { case (c, m) =>
      val minId = m.keys.min
      val row = out.find(_.getLong(0) == minId).get
      assert(row.getLong(3) == 1L, s"cluster $c min id $minId dropped")
    }
  }

  test("q_token_budget_select: equals the brute-force budget prefix with ties") {
    val budget = 20000L
    // brute force: order all docs by (score desc, doc_id), take the prefix
    // until cumulative tokens reach the budget, then extend to ALL ties at
    // the boundary score — the declared selection rule
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        round(graft.prep.TextFunctions.qualityScore(col("text")), 6)
          .as("score"),
        graft.prep.TextFunctions.tokenEstimate(col("text")).as("n_tokens"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(t => (-t._2, t._1))
    var cum = 0L
    var sT = Double.NegativeInfinity
    val it = all.iterator
    var crossed = false
    while (it.hasNext && !crossed) {
      val (_, sc, n) = it.next()
      cum += n
      if (cum >= budget) { sT = sc; crossed = true }
    }
    val want = all.filter(t => !crossed || t._2 >= sT).map(_._1).toSet
    val got = Queries.queryMap("q_token_budget_select")(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSet == want)
    // budget semantics: dropping the boundary-score ties dips below budget,
    // keeping them meets it (when the corpus exceeds the budget at all)
    if (crossed) {
      val selTok = got.map(_.getLong(2)).sum
      val boundaryTok = got.filter(_.getDouble(1) == sT).map(_.getLong(2)).sum
      assert(selTok >= budget, s"selected $selTok < $budget")
      assert(selTok - boundaryTok < budget,
        s"selection is not the minimal >= budget tie-closed prefix")
    }
    // output ordering: score desc, doc_id asc
    val ord = got.map(r => (-r.getDouble(1), r.getLong(0))).toSeq
    assert(ord == ord.sorted)
  }

  test("q_bigram_ppl: held-out docs only, counts match, backoff keeps nll finite") {
    // value-level equality is the DuckDB oracle's job (it replays the whole
    // train/score split); here assert the invariants the rule implies:
    // only odd (held-out) docs appear, token counts match the raw word
    // counts, and nll is finite-positive (backoff's add-one floor keeps
    // every token scoreable: no -ln(0) possible even for unseen unigrams)
    val out = Queries.queryMap("q_bigram_ppl")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "size(split(text, ' ')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, n, nll) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(id % 2 == 1, s"doc $id is a training doc")
      assert(n == docs(id), s"doc $id token count")
      assert(nll > 0.0 && !nll.isInfinite && !nll.isNaN, s"doc $id nll=$nll")
    }
    assert(out.length == docs.count(_._1 % 2 == 1))
  }

  test("bpeMergeFold is greedy left-to-right (chain semantics)") {
    import spark.implicits._
    import graft.prep.{TextFunctions => TF}
    // the sequential rule: after a merge, the NEW symbol is what the next
    // position compares against — "aaaaaa" under (a,a) must give
    // [aa,aa,aa], never the [aa,a,aa,a] a replace-until-fixpoint produces
    val cases = Seq(
      ("aaaaaa", "a", "a", Seq("aa", "aa", "aa")),
      ("aaa", "a", "a", Seq("aa", "a")),
      ("ababab", "a", "b", Seq("ab", "ab", "ab")),
      ("babab", "a", "b", Seq("b", "ab", "ab")),
      ("x", "a", "b", Seq("x")),
      ("ab", "b", "a", Seq("a", "b")))
    for ((w, a, b, want) <- cases) {
      val got = Seq(w).toDF("w")
        .select(TF.bpeMergeFold(TF.bpeEncode(col("w")), a, b).as("enc"))
        .collect()(0).getString(0).split(TF.bpeSep).toSeq
      assert(got == want, s"fold($w, $a+$b): $got != $want")
    }
    // merged symbols are opaque: after (a,a) -> aa, a second (a,a) round
    // must NOT merge into an existing "aa" (symbol identity, not suffix)
    val twice = Seq("aaa").toDF("w")
      .select(TF.bpeMergeFold(
        TF.bpeMergeFold(TF.bpeEncode(col("w")), "a", "a"), "a", "a").as("enc"))
      .collect()(0).getString(0).split(TF.bpeSep).toSeq
    assert(twice == Seq("aa", "a"), s"double merge: $twice")
  }

  test("q_bpe_merges: equals a driver-side greedy BPE reference") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    var vocab = scala.collection.mutable.Map.empty[Vector[String], Long]
    for (t <- texts; w <- t.toLowerCase.split("[^a-z]+") if w.nonEmpty) {
      val k = w.map(_.toString).toVector
      vocab(k) = vocab.getOrElse(k, 0L) + 1L
    }
    val want = scala.collection.mutable.Buffer.empty[(Long, String, String, Long)]
    for (r <- 1 to 3) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        pc(k) = pc.getOrElse(k, 0L) + n
      }
      val ((a, b), c) = pc.toSeq.minBy { case ((l, rr), cnt) => (-cnt, l, rr) }
      want += ((r.toLong, a, b, c))
      val nv = scala.collection.mutable.Map.empty[Vector[String], Long]
      for ((syms, n) <- vocab) {
        val out = scala.collection.mutable.Buffer(syms.head)
        for (x <- syms.tail)
          if (out.last == a && x == b) out(out.length - 1) = a + b
          else out += x
        val k = out.toVector
        nv(k) = nv.getOrElse(k, 0L) + n
      }
      vocab = nv
    }
    val got = Queries.queryMap("q_bpe_merges")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == want.toSeq)
    // new_token is the concatenation, ranks are 1..3 in order
    Queries.queryMap("q_bpe_merges")(spark, dir).collect().foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
    }
  }

  test("q_bpe_apply: per-doc token counts equal a driver-side tokenizer") {
    // learn the merges with the same greedy reference as the merges spec,
    // then tokenize each doc and compare counts + compression
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def wordsOf(t: String) = t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
    var vocab = scala.collection.mutable.Map.empty[Vector[String], Long]
    for ((_, t) <- docs; w <- wordsOf(t)) {
      val k = w.map(_.toString).toVector
      vocab(k) = vocab.getOrElse(k, 0L) + 1L
    }
    def mergeWord(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = scala.collection.mutable.Buffer(syms.head)
      for (x <- syms.tail)
        if (out.last == a && x == b) out(out.length - 1) = a + b
        else out += x
      out.toVector
    }
    val merges = scala.collection.mutable.Buffer.empty[(String, String)]
    for (_ <- 1 to 3) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, n) <- vocab; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        pc(k) = pc.getOrElse(k, 0L) + n
      }
      val ((a, b), _) = pc.toSeq.minBy { case ((l, rr), cnt) => (-cnt, l, rr) }
      merges += ((a, b))
      vocab = vocab.foldLeft(
        scala.collection.mutable.Map.empty[Vector[String], Long]) {
        case (nv, (syms, n)) =>
          val k = mergeWord(syms, a, b)
          nv(k) = nv.getOrElse(k, 0L) + n; nv
      }
    }
    def tokenize(w: String): Vector[String] =
      merges.foldLeft(w.map(_.toString).toVector) { case (syms, (a, b)) =>
        mergeWord(syms, a, b)
      }
    val want = docs.flatMap { case (id, t) =>
      val ws = wordsOf(t)
      if (ws.isEmpty) None
      else {
        val chars = ws.map(_.length.toLong).sum
        val toks = ws.map(w => tokenize(w).length.toLong).sum
        Some((id, ws.length.toLong, chars, toks,
          BigDecimal(chars.toDouble / toks)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.sortBy(_._1).toSeq
    val got = Queries.queryMap("q_bpe_apply")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == want)
    // tokenization never expands: tokens <= chars, and >= words
    got.foreach { case (_, nw, nc, nt, _) =>
      assert(nt <= nc && nt >= nw)
    }
  }

  test("q_priority_sample: equals a driver-side priority-sampling reference") {
    // exact replay: same md5-derived dyadic uniform, same single IEEE
    // division, so doubles match bitwise (no tolerance needed)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def pri(id: Long, text: String): (Long, Double) = {
      val w = math.ceil(text.length / 4.0).toLong
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = (java.lang.Long.parseLong(h, 16) + 1).toDouble / 281474976710656.0
      (w, w.toDouble / u)
    }
    val all = docs.map { case (id, t) =>
      val (w, p) = pri(id, t); (id, w, p)
    }.sortBy { case (id, _, p) => (-p, id) }
    val tau = all(100)._3
    val want = all.take(100).map { case (id, w, p) =>
      (id, w,
        BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(math.max(w.toDouble, tau))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(_._1).toSeq
    val got = Queries.queryMap("q_priority_sample")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got == want)
    // the frontier property: every excluded doc's priority <= tau
    val sampled = want.map(_._1).toSet
    all.filterNot(x => sampled(x._1)).foreach { case (_, _, p) =>
      assert(p <= tau)
    }
    // est = max(w, tau) >= w: the estimator never shrinks a kept weight
    got.foreach { case (_, w, _, est) => assert(est >= w.toDouble) }
  }

  test("CountMin: one-sided error, bounded size, snapshot mergeability") {
    import graft.prep.{CountMin, TextFunctions => TF}
    val (depth, width) = (4, 512)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def grams(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(TF.shinglesOfWordsAll(TF.words(col("text")), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).cast("long").as("n"))
    val all = grams(docs).cache()
    val sketch = CountMin.build(all, "g", "n", depth, width).cache()
    // bounded by construction: never more than depth x width cells
    assert(sketch.count() <= depth.toLong * width)
    // the count-min guarantee: the estimate NEVER undercounts, for every
    // gram (not just heavy hitters)
    // (estimate carries the candidate frame's extra columns through)
    val under = CountMin.estimate(sketch, all, "g", depth, width)
      .where(col("est") < col("n")).count()
    assert(under == 0)
    // snapshot mergeability — the 100 TB property: the sketch of the full
    // corpus equals the CELL-WISE SUM of the two half-corpus sketches
    val even = CountMin.build(grams(docs.where(col("doc_id") % 2 === 0)),
      "g", "n", depth, width)
    val odd = CountMin.build(grams(docs.where(col("doc_id") % 2 === 1)),
      "g", "n", depth, width)
    val merged = even.union(odd).groupBy("d", "cell")
      .agg(sum("cnt").cast("long").as("cnt"))
    assert(merged.join(sketch, Seq("d", "cell"))
      .where(merged("cnt") =!= sketch("cnt")).count() == 0)
    assert(merged.count() == sketch.count())
    all.unpersist(); sketch.unpersist()
  }

  test("HyperLogLog: bounded registers, max-mergeability, error band") {
    import spark.implicits._
    import graft.prep.HyperLogLog
    // synthetic stream with KNOWN cardinality, heavy repetition (HLL must
    // be repetition-blind: registers from the raw stream, no pre-distinct)
    val n = 5000
    val stream = (1 to n).flatMap(i => Seq.fill(1 + i % 3)(s"item_$i"))
      .toDF("g")
    val regs = HyperLogLog.registers(stream, "g").cache()
    assert(regs.count() <= HyperLogLog.m)
    val est = HyperLogLog.estimate(regs).collect()(0).getDouble(0)
    // fixed deterministic hash -> fixed estimate; 3 sigma = 3*1.04/8 = 39%
    assert(math.abs(est - n) / n < 0.39, s"est $est vs $n")
    // register-wise max merge of disjoint halves == full-stream registers
    val a = HyperLogLog.registers(
      stream.where(substring(col("g"), 6, 10).cast("int") <= n / 2), "g")
    val b = HyperLogLog.registers(
      stream.where(substring(col("g"), 6, 10).cast("int") > n / 2), "g")
    val merged = HyperLogLog.merge(a, b)
    assert(merged.join(regs, Seq("bucket"))
      .where(merged("r") =!= regs("r")).count() == 0)
    assert(merged.count() == regs.count())
    // merging a stream with itself is a no-op (idempotent max)
    val self = HyperLogLog.merge(regs, regs)
    assert(HyperLogLog.estimate(self).collect()(0).getDouble(0) == est)
    // repetition-blindness: the distinct stream gives the SAME estimate
    // (what lets q_hll_distinct share the exact anchor's distinct table)
    val distinctEst = HyperLogLog.estimate(
      HyperLogLog.registers(stream.distinct(), "g")).collect()(0).getDouble(0)
    assert(distinctEst == est)
    regs.unpersist()
  }

  test("bloom filter: zero false negatives, bounded size, merge = union") {
    import spark.implicits._
    import graft.prep.BloomFilter
    val k = 3; val m = 1024
    val members = (1 to 400).map(i => s"member-$i").toDF("g")
    val filter = BloomFilter.build(members, "g", k, m).cache()
    // bounded by construction: never more than m set bits
    assert(filter.count() <= m)
    // ZERO false negatives: every inserted item probes positive
    assert(BloomFilter.mightContain(filter, members, "g", k, m)
      .count() == 400)
    // one-sided error is visible but small at this load factor
    // (n=400, m=1024, k=3 -> fp ~ (1-e^{-kn/m})^3 ~ 0.33); the point
    // asserted is one-sidedness, not the rate
    val strangers = (1 to 400).map(i => s"stranger-$i").toDF("g")
    val fp = BloomFilter.mightContain(filter, strangers, "g", k, m).count()
    assert(fp < 400, "a bloom must reject at least some non-members here")
    // merge of disjoint halves == filter of the union (bitwise OR ==
    // distinct union of position tables)
    val a = BloomFilter.build(members.where(substring(col("g"), 8, 10)
      .cast("int") <= 200), "g", k, m)
    val b = BloomFilter.build(members.where(substring(col("g"), 8, 10)
      .cast("int") > 200), "g", k, m)
    val merged = a.union(b).distinct()
    assert(merged.except(filter).count() == 0)
    assert(filter.except(merged).count() == 0)
    filter.unpersist()
  }

  test("grouped HLL: per-group registers bounded, each group == its own global sketch") {
    import spark.implicits._
    import graft.prep.HyperLogLog
    val rows = (1 to 3000).map(i => (s"src-${i % 3}", s"item-${i % 700}"))
      .toDF("source", "g")
    val regs = HyperLogLog.registersBy(rows, "g", "source").cache()
    // bounded: <= m registers per group
    val oversized = regs.groupBy("source").count()
      .where(col("count") > HyperLogLog.m)
    assert(oversized.isEmpty)
    // slicing commutes with sketching: the grouped estimate for one group
    // equals the GLOBAL sketch of that group's slice
    val grouped = HyperLogLog.estimateBy(regs, "source")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    Seq("src-0", "src-1", "src-2").foreach { src =>
      val solo = HyperLogLog.estimate(HyperLogLog.registers(
        rows.where(col("source") === src), "g")).collect()(0).getDouble(0)
      assert(grouped(src) == solo, s"$src grouped != global-of-slice")
    }
    regs.unpersist()
  }

  test("bottom-k sketch: bounded, mergeable, replay-idempotent, plan is bounded selection") {
    import spark.implicits._
    import graft.prep.BottomK
    val k = 64
    val rows = (1L to 1000L).map(i => (i, i % 97)).toDF("id", "v")
    val sk = BottomK.sketch(rows, "id", "v", k).cache()
    // bounded by construction
    assert(sk.count() == k)
    // the sketch IS the k smallest hashes (brute-force cross-check)
    val brute = rows.select(BottomK.hashOf(col("id")).as("hv"),
        col("v").cast("long").as("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).take(k).toSet
    assert(sk.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == brute)
    // mergeability: bottom-k(A ∪ B) == merge(bottom-k(A), bottom-k(B))
    val a = BottomK.sketch(rows.where(col("id") <= 500), "id", "v", k)
    val b = BottomK.sketch(rows.where(col("id") > 500), "id", "v", k)
    val merged = BottomK.merge(a, b, k)
    assert(merged.except(sk).count() == 0 && sk.except(merged).count() == 0)
    // replay idempotence: re-observing the same sketch changes nothing
    val replayed = BottomK.merge(sk, sk, k)
    assert(replayed.except(sk).count() == 0
      && sk.except(replayed).count() == 0)
    // plan: the k-smallest selection is TakeOrderedAndProject (bounded
    // per-partition heap + k-row merge), never a global Sort
    val plan = BottomK.sketch(rows, "id", "v", k)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // quantile estimates land within the sample's resolution: with v
    // uniform over 0..96, every estimated quantile must itself be a
    // value that occurs (type-1 selection) and be ordered in p
    val qs = BottomK.quantiles(sk, Seq(0.1, 0.5, 0.9))
      .orderBy("p").collect().map(_.getLong(1))
    assert(qs.sorted.sameElements(qs), "quantile estimates must be monotone in p")
    sk.unpersist()
  }

  test("incremental clusters == batch clustering, history edges never re-walked") {
    import spark.implicits._
    import graft.prep.Dedup
    // history: two clusters {1,2,3} (label 1) and {10,11} (label 10), and
    // an untouched cluster {20,21} that the batch never reaches
    val oldEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L))
      .toDF("i", "j")
    val assignments = Dedup.connectedComponents(oldEdges)
    // new batch: node 30 bridges BOTH old clusters (the adversarial merge
    // case — two persisted labels must collapse to the global min), plus
    // a brand-new pair (40,41)
    val newEdges = Seq((3L, 30L), (30L, 10L), (40L, 41L)).toDF("i", "j")
    val inc = Dedup.incrementalClusters(assignments, newEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Dedup.connectedComponents(oldEdges.union(newEdges))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(inc === batch)
    // the merged component's label is the global min across BOTH old
    // clusters and the bridge node
    assert(inc(30L) == 1L && inc(11L) == 1L && inc(3L) == 1L)
    // untouched clusters keep their labels; the new pair labels itself
    assert(inc(20L) == 20L && inc(21L) == 20L && inc(41L) == 40L)
    // replay idempotence: folding the same batch in again changes nothing
    val replayed = Dedup.incrementalClusters(
      Dedup.incrementalClusters(assignments, newEdges), newEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(replayed === batch)
  }

  test("hash-embed knn: 16-dim count vectors, self at rank 1, permutation-stable") {
    val res = QueriesPipeline.qHashEmbedKnn.fn(spark, dir).collect()
    // each of the 3 query docs retrieves itself first at distance 0
    // (cosine of a vector with itself), the basic sanity of any embedder
    val self = res.filter(r => r.getLong(0) == r.getLong(1))
    assert(self.length == 3)
    assert(self.forall(r => r.getLong(3) == 1L && r.getDouble(2) == 0.0))
    // hashed-count vectors: 16 dims, entries sum to the doc's word count
    // (the hashing trick loses WHICH word, never HOW MANY)
    import graft.prep.{TextFunctions => TF}
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val d = 16
    val vecs = docs
      .select(col("doc_id"), explode(TF.words(col("text"))).as("w"))
      .withColumn("b",
        pmod(conv(substring(md5(col("w").cast("binary")), 1, 6), 16, 10)
          .cast("long"), lit(d.toLong)))
      .groupBy("doc_id")
      .agg(array((0 until d).map(b =>
        sum(when(col("b") === b, lit(1L)).otherwise(lit(0L)))
          .cast("double")): _*).as("vec"))
    val checked = vecs.join(
        docs.select(col("doc_id"), TF.wordCount(col("text")).as("n")),
        "doc_id")
      .where(size(col("vec")) =!= d ||
        aggregate(col("vec"), lit(0.0), (acc, x) => acc + x) =!=
          col("n").cast("double"))
    assert(checked.count() == 0)
  }

  test("span contamination agrees with gram contamination on WHICH docs leak") {
    // a doc has a leaking 5-gram SPAN iff it shares a 5-gram with the
    // benchmark — the two decontamination views must flag the same docs
    val spanDocs = QueriesText.qSpanContamination.fn(spark, dir)
      .where(col("n_leak_spans") > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val gramDocs = QueriesPipeline.qContamination.fn(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(spanDocs === gramDocs)
  }

  test("q_bloom_contamination: bloom-positive set contains every exact leak") {
    // the query's own one-sidedness, end to end on real testdata: per doc
    // n_bloom_grams >= n_exact_grams, and the exact-leak docs from
    // q_contamination all appear with at least their exact count
    val bloomRows = QueriesPipeline.qBloomContamination.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    bloomRows.foreach { case (d, (nb, ne)) =>
      assert(nb >= ne, s"doc $d: bloom $nb < exact $ne")
    }
    val exact = QueriesPipeline.qContamination.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (d, n) =>
      assert(bloomRows.contains(d), s"exact-leak doc $d missing from bloom")
      assert(bloomRows(d)._2 == n,
        s"doc $d: exact count through the bloom path ${bloomRows(d)._2} != $n")
    }
  }

  test("skewOf: planted hot key shows up in ratio, percentiles, top_key") {
    import spark.implicits._
    // 96 singleton keys + one key with 100 rows: rows=196, keys=97,
    // avg=196/97, max=100, p50=1 (96 of 97 keys are singletons), p99=100
    val df = ((1 to 96).map(k => k.toLong) ++ Seq.fill(100)(999L))
      .toDF("k")
    val r = QueriesPipeline.skewOf(df, "planted", col("k")).collect().head
    assert(r.getAs[Long]("n_rows") == 196L)
    assert(r.getAs[Long]("n_keys") == 97L)
    assert(r.getAs[Long]("max_cnt") == 100L)
    assert(r.getAs[Long]("p50_cnt") == 1L)
    assert(r.getAs[Long]("p99_cnt") == 100L)
    assert(r.getAs[Long]("top_key") == 999L)
    assert(math.abs(r.getAs[Double]("skew_ratio") - 100.0 * 97 / 196) < 1e-6)
  }

  test("AsofJoin directions: backward/forward/nearest semantics + tie rule") {
    import spark.implicits._
    import graft.operators.AsofJoin
    val left = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 300L),
      (4L, 20L, 50L)).toDF("lid", "k", "t")
    val right = Seq((11L, 10L, 90L), (12L, 10L, 200L), (13L, 10L, 210L),
      (14L, 20L, 60L)).toDF("rid", "k", "rt")
    def run(d: String) = AsofJoin.asof(left, right, "k", "k", "t", "rt",
      Seq("rid"), direction = d).select("lid", "rid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // backward: latest rt <= t; left 4 (t=50) has no prior right → dropped
    assert(run("backward") == Map(1L -> 11L, 2L -> 12L, 3L -> 13L))
    // forward: earliest rt >= t; left 3 (t=300) has no later right → dropped
    assert(run("forward") == Map(1L -> 12L, 2L -> 13L, 4L -> 14L))
    // nearest: 100→90 (d10) not 200 (d100); 205→200/210 BOTH d5 → tie →
    // backward (200); 300→210; 50→60 (forward only)
    assert(run("nearest") ==
      Map(1L -> 11L, 2L -> 12L, 3L -> 13L, 4L -> 14L))
    // equality counts in both directions: t == rt matches itself
    val eq = Seq((9L, 10L, 200L)).toDF("lid", "k", "t")
    assert(AsofJoin.asof(eq, right, "k", "k", "t", "rt", Seq("rid"),
      direction = "forward").select("rid").collect().head.getLong(0) == 12L)
  }

  test("AsofJoin tolerance: out-of-bound matches drop; nearest gates each " +
      "direction BEFORE the closer-of-two choice (merge_asof parity)") {
    import spark.implicits._
    import graft.operators.AsofJoin
    val left = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 300L),
      (4L, 20L, 50L)).toDF("lid", "k", "t")
    val right = Seq((11L, 10L, 90L), (12L, 10L, 200L), (13L, 10L, 210L),
      (14L, 20L, 60L)).toDF("rid", "k", "rt")
    def run(d: String, tol: Long) = AsofJoin.asof(left, right, "k", "k",
      "t", "rt", Seq("rid"), direction = d, tolerance = Some(tol))
      .select("lid", "rid")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // backward tol=10: lid1 gap 10 ok; lid2 gap 5 ok; lid3 gap 90 → drop
    assert(run("backward", 10L) == Map(1L -> 11L, 2L -> 12L))
    // forward tol=10: lid1→200 gap 100 drop; lid2→210 gap 5 ok; lid4 gap 10 ok
    assert(run("forward", 10L) == Map(2L -> 13L, 4L -> 14L))
    // nearest tol=95: lid3's backward candidate (210, gap 90) survives;
    // lid1: backward 90 (gap 10) beats forward 200 (gap 100, gated out
    // anyway at tol=95... no: 100 > 95 → forward null, backward wins)
    assert(run("nearest", 95L) ==
      Map(1L -> 11L, 2L -> 12L, 3L -> 13L, 4L -> 14L))
    // nearest tol=8: lid1's backward (gap 10) gated out AND forward (gap
    // 100) gated out → dropped; lid2 tie → backward; lid4 forward never
    // beats its 10-gap → dropped. The gate is per-direction: a nearest
    // overall-winner beyond tol must not block an in-tol other side.
    assert(run("nearest", 8L) == Map(2L -> 12L))
    // per-direction gating: lid3 at tol=90 keeps backward (gap exactly 90)
    assert(run("nearest", 90L).get(3L).contains(13L))
    intercept[IllegalArgumentException] {
      AsofJoin.asof(left, right, "k", "k", "t", "rt", Seq("rid"),
        tolerance = Some(-1L))
    }
  }

  test("basketPairs mega-basket cap: over-cap order excluded from pairs, " +
      "support, AND the order universe; exact no-op when nothing is over") {
    import spark.implicits._
    // three normal 2-item baskets sharing pair (1,2); one 50-item cart
    val normal = (1 to 3).flatMap(o => Seq((o.toLong, 1L), (o.toLong, 2L)))
    val mega = (1 to 50).map(p => (99L, p.toLong))
    val lines = (normal ++ mega).toDF("ok", "pk")
    // capped: the mega cart is out entirely → (1,2) counted 3 times over a
    // 3-order universe with supports 3/3 → lift 3·3/(3·3) = 1
    val c = QueriesRelational.basketPairs(lines, minSupport = 3L,
      maxBasket = 10).collect()
    assert(c.length == 1)
    assert((c.head.getLong(0), c.head.getLong(1), c.head.getLong(2)) ==
      (1L, 2L, 3L))
    assert(c.head.getDouble(3) == 1.0)
    // unbounded: mega joins in → (1,2) support 4; its other C(50,2)-ish
    // pairs die at minSupport
    val f = QueriesRelational.basketPairs(lines, minSupport = 3L,
      maxBasket = 1000).collect()
    assert(f.length == 1 && f.head.getLong(2) == 4L)
    // the monitoring hook surfaces exactly the excluded cart
    val oc = QueriesRelational.overCapBaskets(lines, 10).collect()
    assert(oc.length == 1 &&
      (oc.head.getLong(0), oc.head.getLong(1)) == (99L, 50L))
    // with no over-cap basket, capped ≡ unbounded row for row
    val onlyNormal = normal.toDF("ok", "pk")
    assert(QueriesRelational.basketPairs(onlyNormal, 3L, 10)
      .collect().toSeq ==
      QueriesRelational.basketPairs(onlyNormal, 3L, 1000000)
        .collect().toSeq)
  }

  test("Generations.hasGenerations: first-batch vs mid-compaction are " +
      "distinguished (advice r11 — no catch-all on AnalysisException)") {
    import graft.core.Generations
    val root = graft.VerifyIO.scratchDir("graft_gens")
    val live = root.resolve("store").toString
    // no dir at all → legitimate first batch
    assert(!Generations.hasGenerations(spark, live))
    // dir exists but holds no _batch= generation → still first batch
    new java.io.File(live).mkdirs()
    assert(!Generations.hasGenerations(spark, live))
    // a generation present → history exists
    new java.io.File(s"$live/_batch=stream-0").mkdirs()
    assert(Generations.hasGenerations(spark, live))
    // live dir absent while a retired/staging dir exists = a compact
    // mid-swap: NOT first batch — must fail loudly, never "empty history"
    VerifyIO.deleteRec(new java.io.File(live))
    new java.io.File(live + "__old").mkdirs()
    intercept[IllegalStateException] {
      Generations.hasGenerations(spark, live)
    }
    VerifyIO.deleteRec(new java.io.File(live + "__old"))
    // a path misconfigured onto a DIFFERENT graft layout (underscore-
    // prefixed partition dirs like _pk= / _centroid=) is a foreign
    // layout, NOT an empty history — the prefix test would silently
    // under-count; only the exact write-metadata names are benign
    new java.io.File(s"$live/_pk=3").mkdirs()
    intercept[IllegalStateException] {
      Generations.hasGenerations(spark, live)
    }
    VerifyIO.deleteRec(new java.io.File(live))
    // exact write-metadata names stay benign
    new java.io.File(live).mkdirs()
    new java.io.File(s"$live/_SUCCESS").createNewFile()
    assert(!Generations.hasGenerations(spark, live))
    VerifyIO.deleteRec(root.toFile)
  }

  test("Pca: recovers a planted dominant direction; unit-norm orthogonal comps") {
    import spark.implicits._
    // planted anisotropy: dim 0 carries ±5, the rest carry deterministic
    // small wiggles — the top eigendirection is e0 with a huge gap, so the
    // fixed-budget power iterate must converge onto it
    val d = 8
    val vecs = (0 until 200).map { i =>
      val s = if (i % 2 == 0) 5.0 else -5.0
      (i.toLong, Array.tabulate(d)(j =>
        if (j == 0) s else 0.1 * math.sin(i * (j + 1)).toFloat))
    }.toDF("vec_id", "embedding")
    val (_, _, c0) = graft.prep.Pca.covariance(vecs, "embedding")
    val fit = graft.prep.Pca.fit(c0, k = 3, iters = 30)
    val byEig = fit.comps.sortBy(-_.eigenvalue)
    // top component is e0 (up to sign, which the sum rule fixed)
    assert(math.abs(byEig.head.loadings(0)) > 0.99,
      s"top loading on dim0 = ${byEig.head.loadings(0)}")
    assert(byEig.head.eigenvalue / fit.trace > 0.9,
      s"planted direction should dominate: ${byEig.head.eigenvalue} / ${fit.trace}")
    // components are unit-norm and pairwise orthogonal once converged
    byEig.foreach { cc =>
      val n2 = cc.loadings.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) < 1e-3, s"norm² $n2")
    }
    for (a <- byEig.indices; b <- a + 1 until byEig.size) {
      val dot = byEig(a).loadings.zip(byEig(b).loadings).map { case (x, y) => x * y }.sum
      assert(math.abs(dot) < 0.02, s"comps $a,$b dot $dot")
    }
    // eigenvalues come out descending when the spectrum has real gaps
    assert(byEig.map(_.eigenvalue) == fit.comps.map(_.eigenvalue).sorted.reverse)

    // the real store is the opposite story: near-isotropic — top var_ratio
    // sits just above the 1/64 uniform floor (the op's measured finding)
    val emb = sf("embeddings")
    val out = graft.prep.Pca.spectrum(spark, emb, "embedding", k = 2, iters = 10)
      .where(col("component") === 1 && col("dim") === 1)
      .select("var_ratio").collect()
    assert(out.length == 1 && out(0).getDouble(0) < 0.1,
      s"expected a flat spectrum on the synthetic store, got ${out.toSeq}")
  }

  test("lineDedup: repeated segments removed, unique docs untouched, order kept") {
    import spark.implicits._
    val boiler = "b1 b2 b3" // 3-word "line" shared by three docs
    val docs = Seq(
      (1L, s"$boiler u11 u12 u13 u14 u15 u16"), // boiler at segment 1
      (2L, s"u21 u22 u23 $boiler u24 u25 u26"), // boiler at segment 2
      (3L, s"u31 u32 u33 u34 u35 u36 $boiler"), // boiler at segment 3
      (4L, "v1 v2 v3 v4 v5 v6 v7 v8"),          // no repeats anywhere
      (5L, boiler)                               // nothing BUT boiler
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs, "doc_id", col("text"),
        segWords = 3, minDf = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    // doc 4: untouched — rewrite is the identity, md5(original text)
    assert(out(4L) == ((3L, 0L, 8L, m("v1 v2 v3 v4 v5 v6 v7 v8"))))
    // docs 1-3: exactly the boiler segment removed, survivors in order
    assert(out(1L) == ((3L, 1L, 6L, m("u11 u12 u13 u14 u15 u16"))))
    assert(out(2L) == ((3L, 1L, 6L, m("u21 u22 u23 u24 u25 u26"))))
    assert(out(3L) == ((3L, 1L, 6L, m("u31 u32 u33 u34 u35 u36"))))
    // doc 5: everything was boilerplate — empty rewrite, md5("")
    assert(out(5L) == ((1L, 1L, 0L, m(""))))
  }

  test("editDistanceJoin equals brute-force levenshtein across edit shapes") {
    import spark.implicits._
    // the corpus oracle only surfaces ed = 0 pairs, so the tolerance
    // machinery (length bands, ±tau start shift, shorter-first segment
    // scheme) is exercised here: substitutions, an INITIAL insertion (the
    // worst case — every later segment shifts), deletions, mixed 2-edit
    // pairs, and just-over-threshold 3-edit pairs that must NOT appear
    val base = "the quick brown fox jumps"
    val keys = Seq(
      1L -> base,
      2L -> base,                          // ed 0
      3L -> "the quick brawn fox jumps",   // ed 1 substitution
      4L -> "xthe quick brown fox jumps",  // ed 1 head insertion (full shift)
      5L -> "the quick brown fox jump",    // ed 1 tail deletion
      6L -> "th quick brawn fox jumps",    // ed 2: deletion + substitution
      7L -> "ze quick brown fox jumpsyy",  // ed 3+: must be excluded
      8L -> "completely different string",
      9L -> "ab"                           // under minLen: dropped
    ).toDF("id", "k")
    val tau = 2
    val got = Dedup.editDistanceJoin(keys, keys, "id", "k", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val kept = keys.where(length(col("k")) >= tau + 1)
    val want = kept.as("a").join(kept.as("b"),
        col("a.id") =!= col("b.id") &&
          levenshtein(col("a.k"), col("b.k")) <= tau)
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.k"), col("b.k")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // sanity on the shapes the test exists for: the head-insertion pair
    // and both 2-edit directions are present; the 3-edit pair is not
    assert(got.contains((1L, 4L, 1L)) && got.contains((4L, 1L, 1L)))
    assert(got.contains((1L, 6L, 2L)))
    assert(!got.exists(p => p._1 == 7L || p._2 == 7L))
    assert(!got.exists(p => p._1 == 9L || p._2 == 9L))
  }

  test("epoch shuffle positions are a permutation and match the one-window rank") {
    import spark.implicits._
    val out = Queries.queryMap("q_epoch_shuffle")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byEpoch = out.groupBy(_._1)
    assert(byEpoch.keySet == Set(0L, 1L))
    val n = byEpoch(0L).length
    for ((_, rows) <- byEpoch) {
      // two-phase bucket-offset rank yields each position exactly once
      assert(rows.map(_._3).sorted.toSeq == (0L until n).toSeq)
      // strided shard assignment is position mod 4
      assert(rows.forall(r => r._4 == ((r._3 % 4) + 4) % 4))
    }
    // the two epochs order the same docs differently (seeded, not identity)
    val ord0 = byEpoch(0L).sortBy(_._3).map(_._2).toSeq
    val ord1 = byEpoch(1L).sortBy(_._3).map(_._2).toSeq
    assert(ord0.toSet == ord1.toSet && ord0 != ord1)
    // and neither epoch is doc_id order (it IS a shuffle)
    assert(ord0 != ord0.sorted && ord1 != ord1.sorted)
  }
}
