package graft.prep

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, batch-shaped decode / feature-extraction /
  * frame-sampling over `mapPartitions`.
  *
  * The actual media codecs are STUBBED (no image/audio libraries in this
  * environment — `decodeStub` produces a deterministic fake decode from the
  * payload bytes). Everything Spark-side is real and tested: the schema, the
  * binary column handling, the partition-batched UDF shape (decode cost is
  * amortized per partition, not per row — the mapInPandas batching pattern
  * expressed in Scala), and the downstream feature pipeline.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** Wrap any (id, text-ish) frame as a media frame — the test harness for
    * the plumbing (payload = UTF-8 bytes standing in for encoded media). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      modality: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(modality).as("modality"),
      col(payloadCol).cast(BinaryType).as("payload"),
      struct(lit(null).cast(StringType).as("source"),
        length(col(payloadCol)).cast(LongType).as("n_bytes")).as("meta"))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** ??? real decoder goes here (libjpeg/ffmpeg binding). The stub derives
    * deterministic pseudo-pixels from payload bytes: width/height from the
    * byte length, features = 8 byte-histogram buckets normalized to [0,1].
    * Runs partition-batched: one decoder "context" per partition (the
    * expensive-init-amortization shape real codecs need), rows processed in
    * blocks of `batchSize`.
    */
  def decodeStub(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "modality", "payload").rdd
      .mapPartitions { rows =>
        // per-partition decoder context (stub: a reusable histogram buffer)
        val hist = new Array[Long](8)
        rows.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val id = r.getLong(0)
            val modality = r.getString(1)
            val payload = r.getAs[Array[Byte]](2)
            java.util.Arrays.fill(hist, 0L)
            var i = 0
            while (i < payload.length) {
              hist(((payload(i) & 0xff) >> 5)) += 1
              i += 1
            }
            val n = math.max(payload.length, 1).toFloat
            val features = hist.map(h => h / n)
            val width = math.max(1, math.sqrt(payload.length.toDouble).toInt)
            val height = math.max(1,
              math.ceil(payload.length.toDouble / width).toInt)
            Row(id, modality, width, height, features.toSeq)
          }
        }
      }
    spark.createDataFrame(out, decodedSchema)
  }

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size byte
    * chunk becomes a frame row — the explode-with-ordinality shape of real
    * frame extraction, as a pure Column expression. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256,
      stride: Int = 4): DataFrame =
    media.select(col("media_id"),
        posexplode(transform(
          sequence(lit(0),
            greatest(floor(length(col("payload")) / (frameBytes * stride))
              .cast("int") - 1, lit(0))),
          i => substring(col("payload"), i * frameBytes * stride + 1, lit(frameBytes)))))
      .toDF("media_id", "frame_no", "frame_payload")
      .withColumn("frame_md5", md5(col("frame_payload")))

  /** ??? real resampling kernel goes here (bilinear/Lanczos over decoded
    * pixels). The stub halves/scales the stub dimensions and pools the
    * feature vector down to `targetFeatures` buckets by averaging — the
    * shape of a real resize: per-row pure compute over the decoded frame,
    * no shuffle, output schema identical modulo dimensions. */
  def resizeStub(decoded: DataFrame, scale: Double,
      targetFeatures: Int = 4): DataFrame = {
    require(scale > 0 && targetFeatures > 0)
    // even-boundary pooling: bucket b averages fs[floor(b·n/T), floor((b+1)·n/T))
    // — every input element lands in exactly one bucket (no dropped tail when
    // T∤n) and the output is always exactly T features (n < T duplicates the
    // nearest element, i.e. nearest-neighbor upsampling); empty stays empty
    val pool = udf { (fs: Seq[Float]) =>
      val n = fs.length
      if (n == 0) Seq.empty[Float]
      else (0 until targetFeatures).map { b =>
        // start < n for every b < T, and end <= n, so the slice is never
        // empty; n < T forces end = start+1 (nearest-neighbor upsampling)
        val start = b * n / targetFeatures
        val end = math.max((b + 1) * n / targetFeatures, start + 1)
        val g = fs.slice(start, end)
        g.sum / g.length
      }
    }
    decoded.select(col("media_id"), col("modality"),
      greatest(ceil(col("width") * scale).cast("int"), lit(1)).as("width"),
      greatest(ceil(col("height") * scale).cast("int"), lit(1)).as("height"),
      pool(col("features")).as("features"))
  }

  /** Downstream feature pipeline on decoded media: nearest-centroid bucket
    * over the stub features — shows decoded output flowing into the vector
    * engine (same array<float> contract as the embeddings table). */
  def featureBuckets(decoded: DataFrame, nBuckets: Int = 4): DataFrame =
    decoded.select(col("media_id"), col("modality"),
      pmod(crc32(concat_ws(",", col("features").cast("array<string>"))),
        lit(nBuckets)).cast("int").as("bucket"))
}
