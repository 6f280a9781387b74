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
