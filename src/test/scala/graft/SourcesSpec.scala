package graft

import org.apache.spark.sql.functions._

/** Source/sink coverage (SURVEY §2.4 scans/sources/sinks): the same frame
  * round-trips through parquet, JSON-lines, and CSV losslessly.
  */
class SourcesSpec extends SparkSpec {

  private lazy val docs = sf("documents").select("doc_id", "lang", "n_chars")

  private def roundtrip(fmt: String): Unit = {
    val dir = graft.VerifyIO.scratchDir(s"graft_src_$fmt").toString
    val writer = docs.write.mode("overwrite")
    (fmt match {
      case "parquet" => writer.parquet(dir)
      case "json" => writer.json(dir)
      case "csv" => writer.option("header", "true").csv(dir)
    })
    val reader = spark.read
    val back = (fmt match {
      case "parquet" => reader.parquet(dir)
      case "json" => reader.json(dir)
      case "csv" => reader.option("header", "true")
        .option("inferSchema", "true").csv(dir)
    }).select(col("doc_id").cast("long"), col("lang"),
      col("n_chars").cast("long"))
    val a = docs.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val b = back.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(a === b, s"$fmt roundtrip mismatch")
  }

  test("parquet roundtrip")(roundtrip("parquet"))
  test("json-lines roundtrip")(roundtrip("json"))
  test("csv roundtrip")(roundtrip("csv"))

  test("eventsTable adapts to both ts generations (nano-long and timestamp)") {
    // The driver has regenerated events.parquet across rounds with ts as
    // TIMESTAMP(NANOS) (read as a nano-epoch long under nanosAsLong) and as
    // TIMESTAMP(MICROS); round 10's bench lost 11 queries to the switch.
    // Both generations must yield identical derived epoch-second columns.
    import spark.implicits._
    val base = Seq((1L, 1704067200L), (2L, 1704070861L), (3L, 1704074522L))
    val dirA = graft.VerifyIO.scratchDir("graft_ev_nanos").toString
    val dirB = graft.VerifyIO.scratchDir("graft_ev_micros").toString
    base.toDF("event_id", "secs")
      .select(col("event_id"),
        (col("secs") * 1000000000L + 179575000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dirA/events.parquet")
    base.toDF("event_id", "secs")
      .select(col("event_id"),
        timestamp_seconds(col("secs") + lit(0.179575)).as("ts"))
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")
    def readTs(d: String): Seq[(Long, Long, java.sql.Timestamp)] =
      Queries.eventsTable(spark, d)
        .select("event_id", "ts_s", "ts_t").orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2))).toSeq
    assert(readTs(dirA) === readTs(dirB))
    assert(readTs(dirB).map(t => (t._1, t._2)) === base)
  }

  test("vector column JSON codec: to_json/from_json keeps embeddings") {
    val e = sf("embeddings").limit(20)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val js = e.select(col("vec_id"), to_json(struct(col("v"))).as("j"))
    val back = js.select(col("vec_id"),
      from_json(col("j"),
        org.apache.spark.sql.types.StructType.fromDDL("v array<double>"))
        .getField("v").as("v"))
    val orig = e.orderBy("vec_id").collect().map(_.getSeq[Double](1))
    val got = back.orderBy("vec_id").collect().map(_.getSeq[Double](1))
    orig.zip(got).foreach { case (a, b) => assert(a === b) }
  }
}
