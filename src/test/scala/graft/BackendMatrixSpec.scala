package graft

import scala.util.Random

import graft.api.Vicinity
import graft.core.{Backend, BackendArgs, Metric}

/** The reference's full 15-config backend grid
  * (`/root/reference/tests/conftest.py:11-21,54-61`): 9 FAISS index types +
  * 6 other backends, each driven through build → query → threshold →
  * save/load → (insert|delete where the backend supports them).
  */
class BackendMatrixSpec extends SparkSpec {

  private val n = 500
  private val dim = 8
  private lazy val rnd = new Random(42)
  private lazy val vectors: Seq[Seq[Double]] =
    Seq.fill(n)(Seq.fill(dim)(rnd.nextDouble()))
  private lazy val items: Seq[String] = (0 until n).map(i => s"item$i")

  private val faissTypes =
    Seq("flat", "ivf", "hnsw", "lsh", "scalar", "pq", "ivf_scalar", "ivfpq",
      "ivfpqr",
      // engine extensions: FAISS binary family (sign-bit BQ, flat + IVF)
      // and the PCAR,PQ transform chain (parametric OPQ)
      "binary", "ivf_binary", "opq")
  private val configs: Seq[(String, Backend, Option[BackendArgs])] =
    faissTypes.map(t => (s"faiss-$t", Backend.Faiss,
      Some(BackendArgs.FaissArgs(Metric.Cosine, indexType = t, nlist = 4)
        : BackendArgs))) ++
    Seq(Backend.Basic, Backend.Hnsw, Backend.Annoy, Backend.Pynndescent,
      Backend.Usearch, Backend.Voyager).map(b => (b.name, b, None))

  for ((label, backend, args) <- configs) {
    test(s"[$label] build / query / threshold / save-load roundtrip") {
      val v = Vicinity.fromVectorsAndItems(spark, items, vectors, backend, args)
      assert(v.length === n)
      // query with a stored vector: k results, ascending, self among top 3
      // (exact strategies put it first; quantized candidates may approximate)
      val res = v.queryOne(vectors(7), 10)
      assert(res.length === 10)
      assert(res.map(_._2) === res.map(_._2).sorted)
      assert(res.take(3).exists(_._1 == items(7)), s"self not in top-3: $res")
      // duplicate-query determinism (test_vicinity.py:62-64)
      val batch = v.query(Seq(vectors(7), vectors(7)), 5)
      assert(batch(0) === batch(1))
      // threshold query runs and respects the bound
      val thr = v.queryThreshold(Seq(vectors(7)), threshold = 0.5)
      assert(thr.head.forall(_._2 <= 0.5))
      // save → load → query returns EXACTLY the pre-save answers: every
      // trained artifact (IVF centroids, PQ codebooks, SQ ranges, seeded
      // LSH planes) persists or re-derives deterministically, so loading
      // never retrains (≙ faiss.py:199-204, base.py:26-32)
      val before = v.queryOne(vectors(7), 10)
      val dir = s"/tmp/graft_matrix_$label"
      v.save(dir, overwrite = true)
      val loaded = Vicinity.load(spark, dir)
      assert(loaded.length === n)
      assert(loaded.queryOne(vectors(7), 10) === before)
      // mutation surface parity (insert: annoy/pynndescent refuse,
      // vicinity.py via annoy.py:120-122, pynndescent.py:75-77;
      // delete: BASIC only, basic.py:48-51)
      if (backend == Backend.Annoy || backend == Backend.Pynndescent) {
        intercept[UnsupportedOperationException] {
          v.insert(Seq("x"), Seq(vectors.head))
        }
      } else {
        // incremental prepare: the inserted vector is immediately findable
        // (cell-assigned / quantized / hashed with the TRAINED artifacts,
        // not a rebuild) — ≙ FAISS add-after-train, faiss.py:157-161
        val v2 = v.insert(Seq("x"), Seq(vectors.head))
        assert(v2.length === n + 1)
        assert(v2.queryOne(vectors.head, 3).exists(_._1 == "x"),
          s"inserted row not findable in [$label]")
      }
      if (backend == Backend.Basic) {
        assert(v.delete(Seq(items.head)).length === n - 1)
      } else {
        intercept[UnsupportedOperationException] { v.delete(Seq(items.head)) }
      }
    }
  }
}
