package graft

import org.apache.spark.sql.functions._

import graft.prep.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(
    sf("documents").limit(50), "doc_id", "text", "image")

  test("asMedia: binary payload + typed metadata schema") {
    // same names and types as the contract (nullability differs when the
    // source columns are parquet-nullable)
    assert(media.schema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
      === Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType.simpleString)).toSeq)
    val r = media.orderBy("media_id").head
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(r.getStruct(3).getLong(1) > 0) // meta.n_bytes
  }

  test("decodeStub: deterministic partition-batched decode") {
    val decoded = Multimodal.decodeStub(media).cache()
    assert(decoded.count() === 50)
    assert(decoded.schema === Multimodal.decodedSchema)
    val r = decoded.orderBy("media_id").head
    assert(r.getInt(2) > 0 && r.getInt(3) > 0) // width, height
    val feats = r.getSeq[Float](4)
    assert(feats.length === 8)
    assert(math.abs(feats.sum - 1.0f) < 1e-3) // normalized histogram
    // deterministic: same input, same output
    val again = Multimodal.decodeStub(media).orderBy("media_id").head
    assert(again.getSeq[Float](4) === feats)
  }

  test("sampleFrames: strided fixed-size chunks with ordinality") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
    assert(frames.count() >= 50) // every doc yields at least frame 0
    val f = frames.where($"media_id" === 0).orderBy("frame_no").collect()
    assert(f.map(_.getInt(1)).toSeq === f.indices.toSeq)
    assert(f.forall(_.getAs[Array[Byte]]("frame_payload").length <= 64))
  }

  test("resizeStub: scaled dimensions, pooled features, schema shape kept") {
    val decoded = Multimodal.decodeStub(media)
    val resized = Multimodal.resizeStub(decoded, scale = 0.5,
      targetFeatures = 4).cache()
    assert(resized.count() === 50)
    val pairs = decoded.select($"media_id", $"width".as("w0"), $"height".as("h0"))
      .join(resized, "media_id").collect()
    pairs.foreach { r =>
      assert(r.getAs[Int]("width") === math.max(1,
        math.ceil(r.getAs[Int]("w0") * 0.5).toInt))
      assert(r.getAs[Int]("height") === math.max(1,
        math.ceil(r.getAs[Int]("h0") * 0.5).toInt))
      assert(r.getAs[Seq[Float]]("features").length === 4)
    }
  }

  test("multimodal near-dup: decoded features feed the embedding dedup kernel") {
    // the multimodal -> dedup bridge: decode produces the same
    // array<float> contract as the embeddings table, so media dedup IS
    // embedding dedup over the decoded features — the threshold
    // self-join kernel consumes them unchanged. What the STUB features
    // guarantee (8 coarse byte-histogram buckets — deliberately
    // non-discriminative between same-language texts; a real decoder's
    // features would separate): an exact payload copy decodes to the
    // identical vector (distance exactly 0), and a small payload
    // perturbation moves the vector only slightly. The pinned claims
    // are the PLUMBING and exact-copy detection, not stub selectivity.
    import graft.operators.Knn
    val base = sf("documents").limit(30)
    val copy = base.where(col("doc_id") === 0)
      .select(lit(1000L).as("doc_id"), col("text"))
    val nearDup = base.where(col("doc_id") === 0)
      .select(lit(1001L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"))
    val media = Multimodal.asMedia(
      base.select("doc_id", "text").union(copy).union(nearDup),
      "doc_id", "text", "image")
    val vecs = Multimodal.decodeStub(media)
      .select(col("media_id").as("id"),
        col("features").cast("array<double>").as("vector"))
    val pairs = Knn.thresholdSelfJoin(vecs, 1e-4, graft.core.Metric.Cosine)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // exact copy: distance exactly 0 to its source, found by the kernel
    assert(pairs.get((0L, 1000L)).contains(0.0), "exact copy not at dist 0")
    // perturbed payload: drifts, but stays within the tight threshold of
    // its source (payload edit of 3 bytes over ~1000)
    val nd = pairs.get((0L, 1001L))
    assert(nd.exists(d => d > 0.0 && d < 1e-4), s"near-dup dist: $nd")
  }

  test("featureBuckets: decoded features flow into bucketed grouping") {
    val decoded = Multimodal.decodeStub(media)
    val buckets = Multimodal.featureBuckets(decoded, nBuckets = 4)
    val counts = buckets.groupBy("bucket").count().collect()
    assert(counts.map(_.getLong(1)).sum === 50)
    assert(counts.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 4))
  }
}
