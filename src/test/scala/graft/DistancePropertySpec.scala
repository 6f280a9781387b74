package graft

import org.apache.spark.sql.functions.typedLit
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.VectorFunctions._

/** Property-based kernel checks (SURVEY §5: the property layer the
  * reference lacks). Uses seeded ScalaCheck generators sampled manually
  * (the scalatest-scalacheck bridge isn't in the offline dependency set).
  */
class DistancePropertySpec extends SparkSpec {
  import spark.implicits._

  private val vecGen: Gen[List[Double]] =
    Gen.chooseNum(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0)))

  private def samples(n: Int): Seq[List[Double]] =
    (0 until n).flatMap(i =>
      vecGen.apply(Gen.Parameters.default, Seed(42L + i)))

  private def eval2(
      f: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      a: Seq[Double], b: Seq[Double]): Double =
    Seq(1).toDF("x").select(f(typedLit(a), typedLit(b)).as("v")).head.getDouble(0)

  test("distance kernels are symmetric and self-distance is ~0") {
    samples(15).foreach { a =>
      assert(math.abs(eval2(euclidean_distance, a, a)) < 1e-9)
      assert(math.abs(eval2(manhattan_distance, a, a)) < 1e-9)
      assert(eval2(hamming_distance, a, a) === 0.0)
    }
    samples(30).grouped(2).foreach { case Seq(a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val a = a0.take(n); val b = b0.take(n)
      assert(math.abs(eval2(euclidean_distance, a, b) - eval2(euclidean_distance, b, a)) < 1e-12)
      assert(math.abs(eval2(cosine_distance, a, b) - eval2(cosine_distance, b, a)) < 1e-12)
      assert(math.abs(eval2(dot_product, a, b) - eval2(dot_product, b, a)) < 1e-12)
      assert(math.abs(eval2(tanimoto_distance, a, b) - eval2(tanimoto_distance, b, a)) < 1e-12)
    }
  }

  test("cosine distance is bounded in [0, 2]; l2sq = euclidean^2") {
    samples(30).grouped(2).foreach { case Seq(a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val a = a0.take(n); val b = b0.take(n)
      val c = eval2(cosine_distance, a, b)
      assert(c >= -1e-12 && c <= 2.0 + 1e-12)
      val e = eval2(euclidean_distance, a, b)
      val sq = eval2(l2sq_distance, a, b)
      assert(math.abs(e * e - sq) < 1e-6)
    }
  }

  test("SQ8 asymmetric distance is within the per-dim quantization error bound") {
    import spark.implicits._
    // the invariant the quantized-replica radius anchors lean on: with
    // per-dim range Δ_i = (hi_i − lo_i), the midpoint decode is within
    // ~Δ_i/256 of the original per dim, so the euclidean ADC distance is
    // within ‖(Δ_i/255)_i‖₂ of the exact distance — a radius whose margin
    // to the nearest quantized distance exceeds cross-engine float noise
    // (and whose MEMBERSHIP the oracle replicates exactly) is stable.
    val dim = 6
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 40).map(i =>
      (i.toLong, List.fill(dim)(rnd.nextDouble() * 4 - 2)))
    val st = graft.index.Sq8Strategy(graft.core.Metric.Euclidean)
    val prepared = st.prepare(vecs.toDF("id", "vector"))
    val got = st.queryThreshold(prepared,
        vecs.take(5).toDF("query_id", "qvector"), 1e9, 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(got.size === 5 * 40) // uncapped: every (query, store) pair
    val bound = math.sqrt((0 until dim).map { d =>
      val c = vecs.map(_._2(d))
      math.pow((c.max - c.min) / 255.0, 2)
    }.sum) + 1e-9
    val byId = vecs.toMap
    got.foreach { case ((q, id), adc) =>
      val exact = math.sqrt(byId(q).zip(byId(id))
        .map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(math.abs(adc - exact) <= bound,
        s"($q,$id): adc=$adc exact=$exact bound=$bound")
    }
  }

  test("connectedComponents matches a reference BFS on random graphs (both solvers)") {
    import graft.prep.Dedup
    // the labels under q_dedup_clusters AND q_leakage_safe_split: a wrong
    // component either merges unrelated docs into one split group or drops
    // a dup pair across the train/eval boundary
    val edgeGen = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 60)
      es <- Gen.listOfN(m, for {
        i <- Gen.chooseNum(0L, n.toLong - 1)
        j <- Gen.chooseNum(0L, n.toLong - 1) if i != j
      } yield (math.min(i, j), math.max(i, j)))
    } yield es.distinct
    def bfsLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val adj = (edges ++ edges.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val seen = scala.collection.mutable.Map[Long, Long]()
      adj.keys.toSeq.sorted.foreach { start =>
        if (!seen.contains(start)) {
          val queue = scala.collection.mutable.Queue(start)
          var comp = List(start)
          seen(start) = -1
          while (queue.nonEmpty) {
            val u = queue.dequeue()
            adj.getOrElse(u, Nil).foreach { v =>
              if (!seen.contains(v)) { seen(v) = -1; queue += v; comp ::= v }
            }
          }
          val label = comp.min
          comp.foreach(seen(_) = label)
        }
      }
      seen.toMap
    }
    (0 until 8).foreach { i =>
      val edges = edgeGen.apply(Gen.Parameters.default, Seed(1000L + i))
        .getOrElse(Seq.empty)
      if (edges.nonEmpty) {
        val expect = bfsLabels(edges)
        val df = edges.toDF("i", "j")
        for (driverMax <- Seq(Long.MaxValue, 0L)) { // union-find vs iterative
          val got = Dedup.connectedComponents(df, driverSolveMaxEdges = driverMax)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          assert(got == expect, s"seed ${1000 + i}, driverMax=$driverMax")
        }
      }
    }
  }

  test("packed Hamming: metric axioms + agreement with the per-dim kernel") {
    def evalPacked(a: Seq[Double], b: Seq[Double]): Double =
      Seq(1).toDF("x").select(
        hamming_packed(pack_sign_bits(typedLit(a)),
          pack_sign_bits(typedLit(b))).cast("double").as("v"))
        .head.getDouble(0)
    // longer vectors than the shared generator: exercise multi-word packing
    val wideGen: Gen[List[Double]] =
      Gen.chooseNum(60, 80).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0)))
    val wide = (0 until 30).flatMap(i =>
      wideGen.apply(Gen.Parameters.default, Seed(7L + i)))
    wide.grouped(2).foreach { case Seq(a0, b0) =>
      val n = math.min(a0.length, b0.length)
      val a = a0.take(n); val b = b0.take(n)
      val h = evalPacked(a, b)
      // identity, symmetry, bounds
      assert(evalPacked(a, a) === 0.0)
      assert(evalPacked(b, a) === h)
      assert(h >= 0.0 && h <= n)
      // agreement with the per-dimension kernel applied to sign vectors
      val sa = a.map(x => if (x > 0) 1.0 else 0.0)
      val sb = b.map(x => if (x > 0) 1.0 else 0.0)
      assert(eval2(hamming_distance, sa, sb) === h)
      // scale invariance of the signature (positive scaling)
      assert(evalPacked(a.map(_ * 3.7), b) === h)
    }
    // triangle inequality over sign space
    wide.grouped(3).foreach { case Seq(a0, b0, c0) =>
      val n = Seq(a0.length, b0.length, c0.length).min
      val (a, b, c) = (a0.take(n), b0.take(n), c0.take(n))
      assert(evalPacked(a, c) <= evalPacked(a, b) + evalPacked(b, c))
    }
  }

  test("l2_normalize produces unit vectors (or zero) and is idempotent") {
    (samples(15) :+ List(0.0, 0.0, 0.0)).foreach { v =>
      val once = Seq(1).toDF("x")
        .select(l2_normalize(typedLit(v)).as("v")).head.getSeq[Double](0)
      val norm = math.sqrt(once.map(x => x * x).sum)
      assert(norm === 0.0 || math.abs(norm - 1.0) < 1e-9)
      val twice = Seq(1).toDF("x")
        .select(l2_normalize(typedLit(once.toList)).as("v")).head.getSeq[Double](0)
      twice.zip(once).foreach { case (t, o) => assert(math.abs(t - o) < 1e-9) }
    }
  }
}
