package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd distance kernel family over `ArrayType(FloatType|DoubleType)`
  * columns — the Spark-native equivalent of the reference's BLAS-batched
  * distance kernels (`/root/reference/vicinity/backends/basic.py:212-247`).
  * All kernels accumulate in double and return DoubleType regardless of the
  * input element type (float32 storage, float64 math — same convention as the
  * reference, which stores float32 in native backends but scores in float64).
  *
  * Each kernel participates in whole-stage codegen via a tight scalar loop
  * (`doGenCode`), so a crossJoin+distance+top-k plan stays inside one
  * WholeStageCodegen span — the Tungsten analogue of the reference's
  * vectorized `x @ V.T` matmul (`basic.py:221`).
  */
abstract class VectorDistanceExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  protected def leftElem: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType
  protected def rightElem: DataType =
    right.dataType.asInstanceOf[ArrayType].elementType

  /** number of double accumulators the kernel needs */
  protected def numAccs: Int
  /** eval-path per-element update */
  protected def evalBody(x: Double, y: Double, accs: Array[Double]): Unit
  /** eval-path finalizer */
  protected def evalFinish(accs: Array[Double], n: Int): Double
  /** codegen per-element update; `x`/`y` are double locals, `accs` fresh names */
  protected def genBody(x: String, y: String, accs: Seq[String]): String
  /** codegen finalizer assigning into `result` */
  protected def genFinish(result: String, accs: Seq[String], n: String): String

  private def mkGet(t: DataType): (ArrayData, Int) => Double = t match {
    case FloatType   => (a, i) => a.getFloat(i).toDouble
    case DoubleType  => (a, i) => a.getDouble(i)
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case LongType    => (a, i) => a.getLong(i).toDouble
    case other => throw new IllegalArgumentException(
      s"$prettyName: unsupported vector element type $other")
  }
  @transient private lazy val getL = mkGet(leftElem)
  @transient private lazy val getR = mkGet(rightElem)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"vector dimension mismatch: $n vs ${b.numElements()}")
    }
    val accs = new Array[Double](numAccs)
    var i = 0
    while (i < n) { evalBody(getL(a, i), getR(b, i), accs); i += 1 }
    evalFinish(accs, n)
  }

  private def accessor(t: DataType): String = t match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
    case IntegerType => "getInt"
    case LongType => "getLong"
    case other => throw new IllegalArgumentException(
      s"$prettyName: unsupported vector element type $other")
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val accs = (0 until numAccs).map(j => ctx.freshName(s"acc$j"))
      val accDecls = accs.map(s => s"double $s = 0.0;").mkString("\n")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("vector dimension mismatch: " +
         |    $n + " vs " + $b.numElements());
         |}
         |$accDecls
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $a.${accessor(leftElem)}($i);
         |  final double $y = (double) $b.${accessor(rightElem)}($i);
         |  ${genBody(x, y, accs)}
         |}
         |${genFinish(ev.value, accs, n)}
       """.stripMargin
    })
}

/** x · y */
case class DotProduct(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def prettyName: String = "dot_product"
  protected def numAccs = 1
  protected def evalBody(x: Double, y: Double, a: Array[Double]): Unit = a(0) += x * y
  protected def evalFinish(a: Array[Double], n: Int): Double = a(0)
  protected def genBody(x: String, y: String, a: Seq[String]) = s"${a(0)} += $x * $y;"
  protected def genFinish(r: String, a: Seq[String], n: String) = s"$r = ${a(0)};"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** 1 − (x·y)/(‖x‖‖y‖); zero vectors get distance 1, matching the reference's
  * zero-safe normalize (`/root/reference/vicinity/utils.py:32-40`: zero vector
  * normalizes to zero, so `1 − x·v = 1`). */
case class CosineDistance(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def prettyName: String = "cosine_distance"
  protected def numAccs = 3
  protected def evalBody(x: Double, y: Double, a: Array[Double]): Unit = {
    a(0) += x * y; a(1) += x * x; a(2) += y * y
  }
  protected def evalFinish(a: Array[Double], n: Int): Double = {
    val denom = math.sqrt(a(1)) * math.sqrt(a(2))
    if (denom == 0.0) 1.0 else 1.0 - a(0) / denom
  }
  protected def genBody(x: String, y: String, a: Seq[String]) =
    s"${a(0)} += $x * $y; ${a(1)} += $x * $x; ${a(2)} += $y * $y;"
  protected def genFinish(r: String, a: Seq[String], n: String) =
    s"""double denom_$n = Math.sqrt(${a(1)}) * Math.sqrt(${a(2)});
       |$r = (denom_$n == 0.0) ? 1.0 : 1.0 - ${a(0)} / denom_$n;""".stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** √Σ(x−y)², clipped at 0 (`basic.py:241-247` clips before sqrt). */
case class EuclideanDistance(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def prettyName: String = "euclidean_distance"
  protected def numAccs = 1
  protected def evalBody(x: Double, y: Double, a: Array[Double]): Unit = {
    val d = x - y; a(0) += d * d
  }
  protected def evalFinish(a: Array[Double], n: Int): Double =
    math.sqrt(math.max(a(0), 0.0))
  protected def genBody(x: String, y: String, a: Seq[String]) =
    s"double d_${a(0)} = $x - $y; ${a(0)} += d_${a(0)} * d_${a(0)};"
  protected def genFinish(r: String, a: Seq[String], n: String) =
    s"$r = Math.sqrt(Math.max(${a(0)}, 0.0));"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ(x−y)² — usearch `l2sq` (`/root/reference/vicinity/backends/usearch.py:27-34`). */
case class L2SquaredDistance(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def prettyName: String = "l2sq_distance"
  protected def numAccs = 1
  protected def evalBody(x: Double, y: Double, a: Array[Double]): Unit = {
    val d = x - y; a(0) += d * d
  }
  protected def evalFinish(a: Array[Double], n: Int): Double = a(0)
  protected def genBody(x: String, y: String, a: Seq[String]) =
    s"double d_${a(0)} = $x - $y; ${a(0)} += d_${a(0)} * d_${a(0)};"
  protected def genFinish(r: String, a: Seq[String], n: String) = s"$r = ${a(0)};"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Σ|x−y| — manhattan/l1 (`/root/reference/vicinity/backends/pynndescent.py:24`). */
case class ManhattanDistance(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def prettyName: String = "manhattan_distance"
  protected def numAccs = 1
  protected def evalBody(x: Double, y: Double, a: Array[Double]): Unit =
    a(0) += math.abs(x - y)
  protected def evalFinish(a: Array[Double], n: Int): Double = a(0)
  protected def genBody(x: String, y: String, a: Seq[String]) =
    s"${a(0)} += Math.abs($x - $y);"
  protected def genFinish(r: String, a: Seq[String], n: String) = s"$r = ${a(0)};"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** 1 − x·y — inner-product *distance* (usearch `ip` convention: smaller is
  * nearer; `/root/reference/vicinity/backends/usearch.py:27-34`). */
case class InnerProductDistance(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def prettyName: String = "inner_product_distance"
  protected def numAccs = 1
  protected def evalBody(x: Double, y: Double, a: Array[Double]): Unit = a(0) += x * y
  protected def evalFinish(a: Array[Double], n: Int): Double = 1.0 - a(0)
  protected def genBody(x: String, y: String, a: Seq[String]) = s"${a(0)} += $x * $y;"
  protected def genFinish(r: String, a: Seq[String], n: String) = s"$r = 1.0 - ${a(0)};"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** #{i : x_i ≠ y_i} — hamming over element values (binary vectors in the
  * reference's usearch backend; we generalize to any array). */
case class HammingDistance(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def prettyName: String = "hamming_distance"
  protected def numAccs = 1
  protected def evalBody(x: Double, y: Double, a: Array[Double]): Unit =
    if (x != y) a(0) += 1.0
  protected def evalFinish(a: Array[Double], n: Int): Double = a(0)
  protected def genBody(x: String, y: String, a: Seq[String]) =
    s"if ($x != $y) ${a(0)} += 1.0;"
  protected def genFinish(r: String, a: Seq[String], n: String) = s"$r = ${a(0)};"
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** 1 − (x·y)/(‖x‖²+‖y‖²−x·y) — Tanimoto distance; on 0/1 vectors this is
  * 1 − |A∩B|/|A∪B| (usearch `tanimoto`, bitset Jaccard). */
case class TanimotoDistance(left: Expression, right: Expression)
    extends VectorDistanceExpression {
  override def prettyName: String = "tanimoto_distance"
  protected def numAccs = 3
  protected def evalBody(x: Double, y: Double, a: Array[Double]): Unit = {
    a(0) += x * y; a(1) += x * x; a(2) += y * y
  }
  protected def evalFinish(a: Array[Double], n: Int): Double = {
    val denom = a(1) + a(2) - a(0)
    if (denom == 0.0) 0.0 else 1.0 - a(0) / denom
  }
  protected def genBody(x: String, y: String, a: Seq[String]) =
    s"${a(0)} += $x * $y; ${a(1)} += $x * $x; ${a(2)} += $y * $y;"
  protected def genFinish(r: String, a: Seq[String], n: String) =
    s"""double denom_$n = ${a(1)} + ${a(2)} - ${a(0)};
       |$r = (denom_$n == 0.0) ? 0.0 : 1.0 - ${a(0)} / denom_$n;""".stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Zero-safe L2 normalize, preserving the input element type — the Spark
  * equivalent of the reference's `normalize` (`/root/reference/vicinity/
  * utils.py:9-42`): zero vectors stay zero instead of dividing by 0.
  */
case class L2Normalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "l2_normalize"
  override def dataType: DataType = child.dataType
  override def nullIntolerant: Boolean = true

  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    elem match {
      case FloatType =>
        var ss = 0.0
        var i = 0
        while (i < n) { val x = a.getFloat(i).toDouble; ss += x * x; i += 1 }
        val norm = math.sqrt(ss)
        if (norm == 0.0) a.copy()
        else {
          val out = new Array[Float](n)
          i = 0
          while (i < n) { out(i) = (a.getFloat(i) / norm).toFloat; i += 1 }
          new GenericArrayData(out)
        }
      case DoubleType =>
        var ss = 0.0
        var i = 0
        while (i < n) { val x = a.getDouble(i); ss += x * x; i += 1 }
        val norm = math.sqrt(ss)
        if (norm == 0.0) a.copy()
        else {
          val out = new Array[Double](n)
          i = 0
          while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
          new GenericArrayData(out)
        }
    }
  }

  private def accessor: String = elem match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
  }
  private def javaT: String = elem match {
    case FloatType => "float"
    case DoubleType => "double"
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ss = ctx.freshName("ss")
      val norm = ctx.freshName("norm")
      val out = ctx.freshName("out")
      val gad = classOf[GenericArrayData].getName
      s"""
         |final int $n = $a.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double v = (double) $a.$accessor($i);
         |  $ss += v * v;
         |}
         |final double $norm = Math.sqrt($ss);
         |if ($norm == 0.0) {
         |  ${ev.value} = $a.copy();
         |} else {
         |  final $javaT[] $out = new $javaT[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = ($javaT) ($a.$accessor($i) / $norm);
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
