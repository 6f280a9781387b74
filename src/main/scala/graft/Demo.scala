package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession

import graft.api.Vicinity
import graft.core.{Backend, BackendArgs, Metric}

/** Library walkthrough through the public API — build, query, threshold,
  * insert, delete, save/load, evaluate, across the three physical
  * strategies. `sbt "runMain graft.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rnd = new Random(42)
    val n = 2000; val dim = 16
    val vectors = Seq.fill(n)(Seq.fill(dim)(rnd.nextDouble()))
    val items = (0 until n).map(i => s"item$i")

    val v = Vicinity.fromVectorsAndItems(spark, items, vectors,
      Backend.Basic, storeVectors = true)
    println(s"count=${v.length} dim=${v.dim}")
    println("top3 for item0: " + v.queryOne(vectors.head, 3)
      .map { case (it, d) => f"$it:$d%.4f" }.mkString(", "))
    println("radius<=0.1 hits for item0: " +
      v.queryThreshold(Seq(vectors.head), 0.1).head.length)

    val v2 = v.insert(Seq("fresh"), Seq(Seq.fill(dim)(0.5)))
    println("after insert, nearest to 0.5-vec: " +
      v2.queryOne(Seq.fill(dim)(0.5), 1).head)
    val v3 = v2.delete(Seq("fresh"))
    println(s"after delete count=${v3.length}")

    v.save("/tmp/graft_demo_idx", overwrite = true)
    val loaded = Vicinity.load(spark, "/tmp/graft_demo_idx")
    println("loaded top1 for item7: " + loaded.queryOne(vectors(7), 1).head)
    println("vector_by_index(7) == original: " +
      (loaded.getVectorByIndex(Seq(7L)).head == vectors(7)))

    for ((b, a) <- Seq(
        (Backend.Annoy, None),
        (Backend.Faiss, Some(BackendArgs.FaissArgs(Metric.Cosine, "ivf", nlist = 16))))) {
      val ann = Vicinity.fromVectorsAndItems(spark, items, vectors, b, a)
      val (qps, recall) = ann.evaluate(vectors.take(20), k = 10)
      println(f"${b.name}%-8s qps=$qps%.1f recall@10=$recall%.3f")
    }
    spark.stop()
  }
}
