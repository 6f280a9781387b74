package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Distributed Lloyd's k-means over an embedding column — the clustering
  * primitive the semantic-dedup family builds on (SemDeDup partitions the
  * pair space by cluster, D4 prunes per-cluster prototypes; both take the
  * cluster column as an input that at 100 TB comes from exactly this job).
  *
  * Unlike the index-training paths (`IvfStrategy` samples to the driver /
  * Spark ML's kmeans|| randomized init), this variant is fully distributed
  * AND deterministic enough to be replayed by an independent SQL engine:
  *
  *  - init: the k rows with the smallest ids seed the centroids, and the
  *    seed id IS the cluster label (stable across engines, no row_number);
  *  - assignment: nearest centroid by euclidean distance ROUNDED to 6
  *    decimals, ties broken on the smaller centroid id — the repo's
  *    rounded-both-sides rule applied at EVERY iteration, so a 1-ulp
  *    summation-order difference between engines cannot flip an argmin
  *    (a flip in iteration 1 would avalanche through the means);
  *  - update: per-(cluster, dim) mean in double; clusters that lose all
  *    members drop out of the next round in both engines alike.
  *
  * Scale shape per iteration: one broadcast of the k×dim centroid table
  * (k rows — bounded by construction, never store-sized) against a single
  * scan of the store, argmin via a lexicographic struct-min aggregate (no
  * window, no sort), then posexplode → hash-agg for the new means. The
  * store is never self-joined and never collected; iteration count is a
  * compile-time constant, so the lineage stays a fixed-depth DAG. */
object Clustering {

  /** Nearest-centroid assignment: (idCol, cluster, dist) with dist the
    * 6-decimal-rounded euclidean distance to the winning centroid.
    * `centroids` must be (cid: long, cvec: array<double>) — k rows. */
  def assign(emb: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val scored = emb.select(col(idCol), col(vecCol).as("_v"))
      .crossJoin(broadcast(centroids))
      .withColumn("_d",
        round(VectorFunctions.euclidean_distance(col("_v"), col("cvec")), 6))
    // struct-min = (dist, cid) lexicographic: rounded distance first,
    // smaller centroid id on ties — deterministic argmin, no window
    scored.groupBy(idCol)
      .agg(min(struct(col("_d"), col("cid"))).as("_m"))
      .select(col(idCol), col("_m.cid").as("cluster"),
        col("_m._d").as("dist"))
  }

  /** One Lloyd update: per-(cluster, dim) means of the assigned vectors,
    * rebuilt into centroid arrays. */
  private def update(emb: DataFrame, asg: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    emb.select(col(idCol), col(vecCol).as("_v"))
      .join(asg.select(col(idCol), col("cluster")), Seq(idCol))
      .select(col("cluster"), posexplode(col("_v")).as(Seq("_p", "_x")))
      .groupBy("cluster", "_p").agg(avg("_x").as("_m"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("_p"), col("_m")))),
        s => s.getField("_m")).as("cvec"))
      .select(col("cluster").as("cid"), col("cvec"))

  /** Pin a centroid frame to the driver and re-emit it as a local
    * relation: k×dim doubles — bounded by construction (the same class of
    * pull as `IvfStrategy`'s trained-centroid collect, NOT a store-sized
    * action). This is what makes each Lloyd round exactly ONE store scan:
    * without it the round-N assignment's lineage nests every earlier
    * round's scans (2 extra scans per round), and at 100 TB the planner
    * would re-execute them all under the final broadcast. */
  private def pinned(centroids: DataFrame): DataFrame = {
    val spark = centroids.sparkSession
    import spark.implicits._
    centroids.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      .toDF("cid", "cvec")
  }

  /** The centroid table after `iters` full Lloyd rounds from the
    * smallest-`k`-ids init: (cid: long, cvec: array<double>) — at most k
    * rows (clusters that lose all members drop), driver-pinned so
    * downstream consumers broadcast a local relation. */
  def kmeansCentroids(emb0: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val emb = emb0.select(col(idCol), col(vecCol).cast("array<double>")
      .as(vecCol))
    val init = pinned(emb.orderBy(col(idCol)).limit(k)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec")))
    (1 to iters).foldLeft(init)((c, _) =>
      pinned(update(emb, assign(emb, c, idCol, vecCol), idCol, vecCol)))
  }

  /** `iters` full Lloyd rounds from the smallest-`k`-ids init, then a
    * final assignment: (idCol, cluster: long, dist: double[rounded 6]). */
  def kmeansAssign(emb0: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val emb = emb0.select(col(idCol), col(vecCol).cast("array<double>")
      .as(vecCol))
    assign(emb, kmeansCentroids(emb0, idCol, vecCol, k, iters),
      idCol, vecCol)
  }
}
