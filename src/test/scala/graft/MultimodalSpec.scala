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

  test("featureBuckets: decoded features flow into bucketed grouping") {
    val decoded = Multimodal.decodeStub(media)
    val buckets = Multimodal.featureBuckets(decoded, nBuckets = 4)
    val counts = buckets.groupBy("bucket").count().collect()
    assert(counts.map(_.getLong(1)).sum === 50)
    assert(counts.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 4))
  }
}
