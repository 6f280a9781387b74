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

  test("MMR at lambda = 1 degenerates to exact top-k (minus self)") {
    val queries = emb.where($"id" < 5)
      .select($"id".as("query_id"), $"vector".as("qvector"))
    val mmr = Knn.mmrRerank(emb, queries, pool = 40, k = 10, lambda = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // exact knn with self excluded: k+1 then drop the self row
    val exact = Knn.query(emb, queries, 11, Metric.Cosine)
      .where($"query_id" =!= $"id")
      .collect().map(r => (r.getLong(0), r.getInt(3).toLong, r.getLong(1)))
      .filter(_._2 <= 11).toSeq
    val exactTop = exact.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).take(10).map(_._3)).toMap
    val mmrTop = mmr.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3)).toMap
    // relevance-only MMR must visit the same ids in the same order
    assert(mmrTop.keySet == exactTop.keySet)
    for ((q, ids) <- mmrTop) assert(ids == exactTop(q), s"query $q")
  }

  test("MMR diversifies: a near-duplicate of rank 1 is demoted below lambda = 1") {
    // planted pool around q = e1: a (rel .80) with a near-copy a'
    // (rel .79), and two diverse directions b (rel .75, sim-to-a .60) and
    // c (rel .70, sim-to-a .56). Relevance order: a, a', b, c. At
    // lambda = 0.5 the dup's score is 0.5·(rel − ~1) ≈ −0.10 while the
    // diverse items score 0.5·(rel − sim) ≈ +0.07, so a' drops out
    // entirely. NOTE the anchor must NOT sit at rel ≈ 1: with a ≈ q every
    // candidate's sim-to-a ≈ its rel and 0.5·(rel − sim) ≈ 0 for
    // everything, which is MMR working as specified, not diversifying.
    val rows = Seq(
      10L -> Seq(0.80, 0.60, 0.0, 0.0),    // a
      11L -> Seq(0.79, 0.61, 0.0, 0.0),    // a': near-duplicate of a
      12L -> Seq(0.75, 0.0, 0.6614, 0.0),  // b: diverse, still relevant
      13L -> Seq(0.70, 0.0, 0.0, 0.7141))  // c: a third direction
    val store = rows.toDF("id", "vector")
    val queries = Seq((99L, Seq(1.0, 0.0, 0.0, 0.0)))
      .toDF("query_id", "qvector")
    def picks(lambda: Double) =
      Knn.mmrRerank(store, queries, pool = 4, k = 3, lambda = lambda)
        .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(picks(1.0) == Seq(10L, 11L, 12L))  // pure relevance keeps the dup
    assert(picks(0.5) == Seq(10L, 12L, 13L))  // diversified: dup demoted out
  }
}
