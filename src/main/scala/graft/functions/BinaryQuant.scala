package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Binary-quantization kernels: 1 bit per dimension.
  *
  * The sign bit is the coarsest scalar quantizer — the limit of the SQ8
  * family's 8-bit codes (compare `/root/reference/vicinity/backends/
  * faiss.py:93-100`, the `scalar` index) taken down to 1 bit. For
  * cosine-normalized embeddings the Hamming distance between sign
  * signatures is a monotone proxy for angular distance (the hyperplane-LSH
  * bound with one hyperplane per axis), so a Hamming scan over packed words
  * is a valid coarse pass before an exact re-rank.
  *
  * Scale story: a 64-dim float vector is 256 bytes; its signature is ONE
  * long. The coarse scan reads 32× less data and the kernel is an XOR +
  * POPCNT per word — both expressions codegen into the whole-stage loop, so
  * the scan never leaves Tungsten rows.
  */

/** Array[Float|Double] → Array[Long]: bit `j` of word `w` is set iff
  * element `w·64 + j` is strictly positive. Sign is scale-invariant, so the
  * packing commutes with L2 normalization — the signature of a raw vector
  * and of its unit form are identical, and the quantizer needs NO training
  * pass (unlike SQ8's learned ranges or PQ's learned codebooks).
  */
case class PackSignBits(child: Expression) extends UnaryExpression {
  override def prettyName: String = "pack_sign_bits"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private def elem: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  private def accessor: String = elem match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
    case other => throw new IllegalArgumentException(
      s"pack_sign_bits: unsupported vector element type $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val words = new Array[Long]((n + 63) >> 6)
    var i = 0
    elem match {
      case FloatType =>
        while (i < n) {
          if (a.getFloat(i) > 0f) words(i >> 6) |= (1L << (i & 63))
          i += 1
        }
      case DoubleType =>
        while (i < n) {
          if (a.getDouble(i) > 0d) words(i >> 6) |= (1L << (i & 63))
          i += 1
        }
    }
    new GenericArrayData(words)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("words")
      val gad = classOf[GenericArrayData].getName
      s"""
         |final int $n = $a.numElements();
         |final long[] $out = new long[($n + 63) >> 6];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.$accessor($i) > 0) $out[$i >> 6] |= (1L << ($i & 63));
         |}
         |${ev.value} = new $gad($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Hamming distance between two packed sign signatures (Array[Long]):
  * Σ popcount(aᵢ XOR bᵢ). Integer-valued and exactly reproducible across
  * engines — which is why the whole BQ query family can be hash-checked
  * against a relational oracle, unlike the float-valued PQ/SQ8 kernels.
  */
case class HammingPacked(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "hamming_packed"
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"signature length mismatch: $n vs ${b.numElements()}")
    }
    var acc = 0
    var i = 0
    while (i < n) {
      acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException("signature length mismatch: " +
         |    $n + " vs " + $b.numElements());
         |}
         |int $acc = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
