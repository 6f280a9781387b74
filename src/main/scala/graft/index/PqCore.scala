package graft.index

import scala.util.Random

import com.fasterxml.jackson.databind.ObjectMapper

/** Shared product-quantization machinery: subspace splitting, seeded
  * driver-side Lloyd's training, byte encoding, and codebook (de)serialization
  * — used by [[PqStrategy]] (flat codes over raw vectors) and
  * [[IvfPqStrategy]] (codes over cell residuals, the FAISS ivfpq semantics,
  * `/root/reference/vicinity/backends/faiss.py:107-109`).
  *
  * Codebooks are a driver-side constant (m × 2^nbits × subDim doubles),
  * trained once on a bounded deterministic sample — training cost never
  * scales with the store, and persisted codebooks make save → load → query
  * bit-identical to the pre-save index (≙ `base.py:26-32`: load reads the
  * index file, never retrains).
  */
private[index] object PqCore {

  /** split [0, dim) into min(m, dim) contiguous subspaces covering every
    * dimension even when m doesn't divide dim */
  def subRanges(dim: Int, m: Int): Array[(Int, Int)] = {
    val mEff = math.min(m, dim)
    val base = dim / mEff
    val extra = dim % mEff
    val out = new Array[(Int, Int)](mEff)
    var start = 0
    var s = 0
    while (s < mEff) {
      val len = base + (if (s < extra) 1 else 0)
      out(s) = (start, len)
      start += len
      s += 1
    }
    out
  }

  /** plain seeded Lloyd's iterations on the driver over a bounded sample —
    * deterministic, no per-subspace Spark job */
  def kmeans(points: Array[Array[Double]], kk: Int, iters: Int,
      rnd: Random): Array[Array[Double]] = {
    val n = points.length
    val keff = math.min(kk, n)
    val centroids = rnd.shuffle(points.indices.toList).take(keff)
      .map(points(_).clone()).toArray
    val assign = new Array[Int](n)
    var it = 0
    while (it < iters) {
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < keff) {
          var d = 0.0
          val ct = centroids(c); val p = points(i)
          var j = 0
          while (j < p.length) { val x = p(j) - ct(j); d += x * x; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(keff)(new Array[Double](points(0).length))
      val counts = new Array[Int](keff)
      i = 0
      while (i < n) {
        val a = assign(i); counts(a) += 1
        val p = points(i); val sm = sums(a)
        var j = 0
        while (j < p.length) { sm(j) += p(j); j += 1 }
        i += 1
      }
      var c = 0
      while (c < keff) {
        if (counts(c) > 0) {
          var j = 0
          while (j < sums(c).length) { centroids(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      it += 1
    }
    centroids
  }

  /** per-subspace codebooks over the sample: (codebooks(s)(c), subDims).
    * Subspaces are independent, so they train in parallel on driver cores;
    * each gets its own seed-derived Random, keeping codebooks deterministic
    * regardless of scheduling order. */
  def train(sample: Array[Array[Double]], m: Int, k: Int,
      seed: Long): (Array[Array[Array[Double]]], Array[Int]) = {
    require(sample.nonEmpty, "cannot train PQ codebooks on an empty sample")
    graft.core.BuildCounters.trainings.incrementAndGet()
    val ranges = subRanges(sample(0).length, m)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = ranges.zipWithIndex.map { case ((start, len), s) =>
      Future {
        kmeans(sample.map(v => java.util.Arrays.copyOfRange(v, start, start + len)),
          k, iters = 10, new Random(seed * 1000003L + s))
      }
    }
    val cbs = futures.map(Await.result(_, Duration.Inf))
    (cbs, ranges.map(_._2))
  }

  /** nearest-centroid byte code per subspace */
  def encode(cb: Array[Array[Array[Double]]], dims: Array[Int],
      arr: Array[Double]): Array[Byte] = {
    val out = new Array[Byte](cb.length)
    var s = 0
    var start = 0
    while (s < cb.length) {
      val len = dims(s)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cb(s).length) {
        val ct = cb(s)(c)
        var d = 0.0
        var j = 0
        while (j < len) { val x = arr(start + j) - ct(j); d += x * x; j += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      start += len
      s += 1
    }
    out
  }

  def toJson(cb: Array[Array[Array[Double]]], dims: Array[Int]): String = {
    val mapper = new ObjectMapper()
    val root = mapper.createObjectNode()
    val dimArr = root.putArray("sub_dims")
    dims.foreach(dimArr.add)
    val cbArr = root.putArray("codebooks")
    cb.foreach { sub =>
      val subNode = cbArr.addArray()
      sub.foreach { cent =>
        val cNode = subNode.addArray(); cent.foreach(cNode.add)
      }
    }
    mapper.writeValueAsString(root)
  }

  def fromJson(s: String): (Array[Array[Array[Double]]], Array[Int]) = {
    val root = new ObjectMapper().readTree(s)
    val dimArr = root.get("sub_dims")
    val dims = (0 until dimArr.size()).map(dimArr.get(_).asInt()).toArray
    val cbArr = root.get("codebooks")
    val cb = (0 until cbArr.size()).map { si =>
      val sub = cbArr.get(si)
      (0 until sub.size()).map { ci =>
        val cent = sub.get(ci)
        (0 until cent.size()).map(cent.get(_).asDouble()).toArray
      }.toArray
    }.toArray
    (cb, dims)
  }
}
