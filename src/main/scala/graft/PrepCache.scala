package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.prep.{Dedup, TextFunctions => TF}

/** Build-once registry for shared data-prep intermediates, mirroring
  * QueriesVector's index registry: the near-dup PAIR SET over the documents
  * table is one computation (MinHash banding + exact Jaccard verify) that
  * several operators consume — pair reporting (q_minhash_dedup) and cluster
  * formation (q_dedup_clusters). Computing it per query would re-shingle
  * and re-band the corpus each time; a real pipeline materializes the pair
  * set once per corpus snapshot. Everything cached is deterministic (seeded
  * signatures), so results equal a fresh computation.
  */
object PrepCache {

  private val pairCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** exact-verified word-3-gram Jaccard >= 0.7 pairs (i, j, jaccard) */
  def minhashPairs(s: SparkSession, dir: String): DataFrame =
    pairCache.getOrElseUpdate(s"${System.identityHashCode(s)}/$dir", {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .withColumn("_words", TF.words(col("text")))
        .select(col("doc_id"), TF.shinglesOfWords(col("_words"), 3).as("shingles"))
      val pairs = Dedup.minhashDedup(docs, "doc_id", "shingles", threshold = 0.7)
        .cache()
      pairs.count()
      pairs
    })
}
